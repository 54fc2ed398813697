#!/usr/bin/env python3
"""Doc-vs-artifact freshness gate (ADVICE r9: total_ratio drifted twice).

Asserts that every place SURVEY.md / README.md states the BENCH_SCALE
headline (total ratio N.NN) matches the committed BENCH_SCALE.json, and
that the README's superlinear-key narrative names exactly the artifact's
superlinear_keys. Exit 1 on drift. Run after regenerating any artifact.
"""
import json
import re
import sys

ok = True
art = json.load(open("BENCH_SCALE.json"))
ratio = f"{art['total_ratio']:.2f}"
want_keys = set(art["superlinear_keys"])

for doc in ("SURVEY.md", "README.md"):
    text = open(doc).read()
    for m in re.finditer(r"total[ _]ratio (\d+\.\d+)", text):
        if m.group(1) != ratio:
            line = text[: m.start()].count("\n") + 1
            print(f"DRIFT {doc}:{line} says total ratio {m.group(1)}, "
                  f"artifact says {ratio}")
            ok = False

# fuzz gate freshness: the committed adversarial-corpus verdicts must be
# all-green and cover the same key surface as the scale artifact — a key
# added without a fuzz run, or a fuzz regression committed unnoticed,
# fails here
fz = json.load(open("FUZZ_CORRECTNESS.json"))
if fz["passed"] != fz["total"]:
    bad = sorted(k for k, v in fz["queries"].items()
                 if not (v.get("hash_match") and not v.get("err")))
    print(f"DRIFT FUZZ_CORRECTNESS.json: {fz['passed']}/{fz['total']} — "
          f"failing keys: {bad}")
    ok = False
if set(fz["queries"]) != set(art["queries"]):
    diff = sorted(set(fz["queries"]) ^ set(art["queries"]))
    print(f"DRIFT: FUZZ_CORRECTNESS vs BENCH_SCALE key sets differ: {diff} "
          "— re-run tools/fuzz_check.py after changing the key surface")
    ok = False

readme = open("README.md").read()
# every artifact superlinear key must be named in README's scale-bench
# narrative, and no key may be *claimed* superlinear that the artifact
# doesn't list (checked only within the BENCH_SCALE paragraph)
para = re.search(r"Measured ALL-KEYS scale bench.*?(?=\n- |\Z)", readme,
                 re.S)
if para is None:
    print("DRIFT README.md: no 'Measured ALL-KEYS scale bench' paragraph")
    ok = False
else:
    named = set(re.findall(r"`(\w+)`", para.group(0)))
    miss = want_keys - named
    if miss:
        print(f"DRIFT README.md: superlinear keys missing from the "
              f"scale-bench paragraph: {sorted(miss)}")
        ok = False

sys.exit(0 if ok else 1)
