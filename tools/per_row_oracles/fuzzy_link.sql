-- fuzzy_link, PER-ROW formulation (the pre-round-11 oracle, kept
-- executable): variant explode over every clean ROW, no exact-name
-- collapse. Quadratic in replica count on a kx corpus — intractable at
-- 25x — but independent of the engine's collapse idea, which is exactly
-- why tools/oracle_crosscheck.py re-runs it at the small scale factors
-- against the shipped collapsed oracle (ADVICE r11: the collapsed oracle
-- mirrors the engine's own optimization; this file is the cross-check
-- that keeps the equivalence argument EXECUTED rather than prose).
WITH clean AS (
  SELECT p_partkey AS pk, p_name AS name
  FROM part WHERE p_name IS NOT NULL AND length(p_name) > 0),
dirty AS (
  SELECT pk,
         substr(name, 1, CAST(pk % length(name) AS INTEGER))
         || substr(name, CAST(pk % length(name) AS INTEGER) + 2, 100000)
           AS dname
  FROM clean),
dv AS (
  SELECT DISTINCT pk, dname,
         CASE WHEN i = 0 THEN dname
              ELSE substr(dname, 1, i - 1) || substr(dname, i + 1, 100000)
         END AS v
  FROM dirty,
       UNNEST(generate_series(0, CAST(length(dname) AS INTEGER))) AS t(i)),
cv AS (
  SELECT DISTINCT pk AS cpk, name,
         CASE WHEN i = 0 THEN name
              ELSE substr(name, 1, i - 1) || substr(name, i + 1, 100000)
         END AS v
  FROM clean,
       UNNEST(generate_series(0, CAST(length(name) AS INTEGER))) AS t(i)),
cand AS (
  SELECT DISTINCT d.pk, d.dname, c.cpk, c.name
  FROM dv d JOIN cv c ON d.v = c.v)
SELECT pk AS p_partkey, CAST(count(*) AS BIGINT) AS n_matches,
       CAST(max(CASE WHEN cpk = pk THEN 1 ELSE 0 END) AS BIGINT) AS recovered
FROM cand WHERE levenshtein(dname, name) <= 1
GROUP BY 1 ORDER BY 1
