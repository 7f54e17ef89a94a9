#!/usr/bin/env python
"""Produce tests/fixtures/golden_msm.json: blst-derived known-good MSM
vectors (SURVEY.md §4(b)).

For each (group, n, seed) case, writes the framework's seeded scalar fixture
(msm_blst_tpu.msm.recode.random_scalars — the same bytes every test uses) to
a temp file, runs the reference-built harness (tools/golden/gen_golden,
see build.sh), and records the serialized MSM result. Points are the
canonical P_i = 2^(i+1)*G on both sides.
"""

import json
import os
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
sys.path.insert(0, REPO)

CASES = [
    # (group, n, seed, nbits)
    (1, 64, 1, 255),
    (1, 128, 7, 255),
    (1, 1027, 9, 255),   # non-power-of-two, per the reference's Go test
    (1, 4096, 3, 255),
    (2, 64, 1, 255),
    (2, 128, 7, 255),
]


def main():
    from msm_blst_tpu.msm import recode

    harness = os.path.join(HERE, "gen_golden")
    if not os.path.exists(harness):
        subprocess.run(["sh", os.path.join(HERE, "build.sh")], check=True)
    out = []
    for group, n, seed, nbits in CASES:
        sc = recode.random_scalars(n, seed=seed)   # uint32[8, n]
        ints = recode.scalars_to_ints(sc)
        with tempfile.NamedTemporaryFile(suffix=".bin", delete=False) as f:
            for v in ints:
                f.write(int(v).to_bytes(32, "little"))
            path = f.name
        res = subprocess.run(
            [harness, str(group), str(n), path, str(nbits)],
            capture_output=True, text=True, check=True)
        os.unlink(path)
        out.append({"group": group, "n": n, "seed": seed, "nbits": nbits,
                    "serialized": res.stdout.strip()})
        print(f"G{group} n={n} seed={seed}: {res.stdout.strip()[:32]}…")
    dest = os.path.join(REPO, "tests", "fixtures", "golden_msm.json")
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", dest)


if __name__ == "__main__":
    main()
