-- minhash_sim_est, PER-ROW formulation (the pre-round-11 oracle with its
-- CTE helpers expanded): shingle-intersection join over every candidate
-- DOC pair, no distinct-text-representative collapse. The per-doc
-- intersection is quadratic in replica count (it spilled past the disk
-- at 25x), but it is independent of the engine's collapse idea —
-- tools/oracle_crosscheck.py re-runs it at the small scale factors
-- against the shipped collapsed oracle so the equivalence argument
-- stays EXECUTED rather than prose (ADVICE r11).
WITH sh AS (
  SELECT doc_id, substr(text, i, 8) AS s
  FROM documents,
       UNNEST(generate_series(1, greatest(length(text)-7, 1))) AS t(i)),
sig AS (
  SELECT doc_id,
    min(substr(md5(s), 1, 8)) AS h0, min(substr(md5(s), 9, 8)) AS h1,
    min(substr(md5(s), 17, 8)) AS h2, min(substr(md5(s), 25, 8)) AS h3,
    min(substr(md5('x'||s), 1, 8)) AS h4, min(substr(md5('x'||s), 9, 8)) AS h5,
    min(substr(md5('x'||s), 17, 8)) AS h6, min(substr(md5('x'||s), 25, 8)) AS h7
  FROM sh GROUP BY doc_id),
bands AS (
  SELECT doc_id, 0 AS band, md5(h0||h1||h2||h3) AS bh FROM sig
  UNION ALL
  SELECT doc_id, 1, md5(h4||h5||h6||h7) FROM sig),
cand AS (
  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
est AS (
  SELECT id1, id2,
         (1000 * ((CASE WHEN sa.h0 = sb.h0 THEN 1 ELSE 0 END) +
                  (CASE WHEN sa.h1 = sb.h1 THEN 1 ELSE 0 END) +
                  (CASE WHEN sa.h2 = sb.h2 THEN 1 ELSE 0 END) +
                  (CASE WHEN sa.h3 = sb.h3 THEN 1 ELSE 0 END) +
                  (CASE WHEN sa.h4 = sb.h4 THEN 1 ELSE 0 END) +
                  (CASE WHEN sa.h5 = sb.h5 THEN 1 ELSE 0 END) +
                  (CASE WHEN sa.h6 = sb.h6 THEN 1 ELSE 0 END) +
                  (CASE WHEN sa.h7 = sb.h7 THEN 1 ELSE 0 END))) // 8
           AS est_milli
  FROM cand JOIN sig sa ON cand.id1 = sa.doc_id
            JOIN sig sb ON cand.id2 = sb.doc_id),
ds AS (SELECT DISTINCT doc_id, s FROM sh),
sizes AS (SELECT doc_id, count(*) AS n FROM ds GROUP BY doc_id),
inter AS (
  SELECT id1, id2, count(*) AS i
  FROM cand JOIN ds a ON a.doc_id = id1
            JOIN ds b ON b.doc_id = id2 AND a.s = b.s
  GROUP BY id1, id2)
SELECT e.id1, e.id2, CAST(est_milli AS BIGINT) AS est_milli,
       CAST((1000 * COALESCE(i, 0)) // (n1.n + n2.n - COALESCE(i, 0))
            AS BIGINT) AS true_milli,
       CAST(ABS(est_milli - (1000 * COALESCE(i, 0)) //
            (n1.n + n2.n - COALESCE(i, 0))) AS BIGINT) AS err_milli
FROM est e
JOIN sizes n1 ON e.id1 = n1.doc_id
JOIN sizes n2 ON e.id2 = n2.doc_id
LEFT JOIN inter ON e.id1 = inter.id1 AND e.id2 = inter.id2
ORDER BY e.id1, e.id2
