"""Batched traceback == per-candidate oracle traceback (cost, coords, cigar)."""

import random

from sassy_ray.kernel import oracle
from sassy_ray.kernel.profiles import get_profile
from sassy_ray.kernel.trace import batch_traceback


def test_batch_traceback_matches_oracle_fuzz():
    rng = random.Random(3)
    prof = get_profile("iupac")
    for _ in range(20):
        k = rng.randint(0, 4)
        jobs = []
        for _ in range(rng.randint(1, 40)):
            m = rng.randint(1, 40)
            n = rng.randint(m, 200)
            pat = bytes(rng.choice(b"ACGT") for _ in range(m))
            txt = bytearray(rng.choice(b"ACGT") for _ in range(n))
            if rng.random() < 0.5:  # plant a near-match
                pos = rng.randrange(max(1, n - m))
                txt[pos : pos + m] = pat
            end = rng.randint(0, n)
            jobs.append((pat, bytes(txt), end))
        got = batch_traceback(
            [j[0] for j in jobs], [j[1] for j in jobs], [j[2] for j in jobs], prof, k
        )
        for (pat, txt, end), mt in zip(jobs, got):
            want = oracle.traceback(pat, txt, end, prof, k)
            assert (mt.text_start, mt.text_end, mt.cost, mt.cigar) == (
                want.text_start,
                want.text_end,
                want.cost,
                want.cigar,
            ), (pat, txt, end, k)
