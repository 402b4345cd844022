"""Bit-exact parity with the compiled reference harness.

tests/golden/c_harness_output.txt is the stdout of `/root/reference`'s own
`./test` (built unmodified with `make` in this sandbox), with the
non-deterministic timing lines removed.  This suite regenerates the exact
same data stream (PCG32 + Lemire, fixed seeds) and reproduces every
deterministic output line — summaries, cross-precision merges, and the full
quantile sweep with its printed value/rank errors — from the Python
implementation.  This is the strongest fidelity statement available: not
"close to" the reference, but byte-equal console output.
"""

import math
import os

import numpy as np
import pytest

from hg64spark import refrandom
from hg64spark.hg64 import HG64

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "c_harness_output.txt")

THREADS = 9
SAMPLES = 1_000_000
RANGE = 1_000_000_000


def test_pcg32_first_values_match_c():
    # first 8 rand_lemire(1e9) outputs from the compiled reference
    want = [82712623, 9710312, 793086764, 974791522, 112662785, 644082400, 398899759, 36065939]
    got = refrandom.rand_lemire_stream(8, RANGE).tolist()
    assert got == want


def _summarize_lines(hg: HG64) -> list[str]:
    """Replicates `summarize` (`/root/reference/test.c:65-81`)."""
    counts = hg.counters
    largest = int(counts.max())
    population = int(counts.sum())
    mean, var = hg.snapshot().mean_variance()
    return [
        f"{hg.sigbits} sigbits",
        f"{hg.size_bytes()} bytes",
        f"{largest} largest",
        f"{population} samples",
        f"mean {mean:f} +/- {math.sqrt(var):f}",
    ]


@pytest.fixture(scope="module")
def harness():
    data = refrandom.harness_data(THREADS, SAMPLES, RANGE)
    return data


def test_full_harness_output_parity(harness):
    data = harness
    lines: list[str] = []

    # main loop t=1..8 (`test.c:211-232`): parallel and merged runs print
    # identical summaries (their equality is the reference's own assert;
    # ours is exact by construction — same counters either way)
    hg = None
    for t in range(1, THREADS):
        hg = HG64(5)
        for i in range(t):
            hg.add_values(data[i])
        lines += _summarize_lines(hg)  # parallel_load summary
        merged = HG64(5)
        for i in range(t):
            merged.merge(HG64(5).add_values(data[i]))
        assert merged == hg  # test.c:221-230 bucket-for-bucket assert
        lines += _summarize_lines(merged)  # merged_load summary

    # cross-precision merges (`test.c:234-237`)
    for sigbits in range(1, 11):
        lines.append(f"MERGE to {sigbits}")
        copy = HG64(sigbits)
        copy.merge(hg)
        lines += _summarize_lines(copy)

    # quantile sweep (`test.c:239-256`) against the per-thread sorted oracle
    data_sorted = np.sort(data, axis=1)
    hs = hg.snapshot()

    def sweep_line(q: float) -> str:
        rank = int(q * THREADS * SAMPLES)
        t = rank % THREADS
        i = rank // THREADS
        dv = int(data_sorted[t][i])
        value = int(hs.value_at_quantile(np.array([q]))[0])
        p = float(hs.quantile_of_value(np.array([dv], dtype=np.uint64))[0])
        div = 1.0 if dv == 0 else float(dv)
        verr = (float(dv) - float(value)) / div
        rerr = (q - p) / (1.0 if q == 0.0 else q)
        return (
            f"data  {q * 100:5.1f}% {dv:8d}"
            f"  hg64 {p * 100:5.1f}% {value:8d}"
            f"  error value {verr:+f} rank {rerr:+f}"
        )

    q = 0.0
    for expo in (-1, -2, -3):
        step = 10.0**expo
        for _ in range(9):
            lines.append(sweep_line(q))
            q += step  # replicate the C float accumulation exactly
    for q_tail in (0.999, 0.9999, 0.99999, 0.999999):
        lines.append(sweep_line(q_tail))

    golden = open(GOLDEN).read().splitlines()
    assert len(lines) == len(golden), (len(lines), len(golden))
    mismatches = [(i, g, l) for i, (g, l) in enumerate(zip(golden, lines)) if g != l]
    assert not mismatches, mismatches[:5]


def test_sigs_tables_match_reference_binary():
    """tests/golden/sigs_output.txt is the stdout of the reference's own
    `sigs` utility (`/root/reference/sigs.c`, built unmodified)."""
    from hg64spark import sigs

    golden = open(os.path.join(os.path.dirname(__file__), "golden", "sigs_output.txt")).read()
    assert sigs.tables() == golden
    assert sigs.digits_to_sigbits(2) == 5  # why the default sigbits is 5


def test_distribution_generators_shapes():
    """F2 stress shapes from the reference generator family
    (`/root/reference/random.c:46-93`), consumed through the same PCG32
    stream, feed the sketch within its value-error bound."""
    from hg64spark.hg64 import HG64

    for name, gen, n in [
        ("exponential", refrandom.exponential, 100_000),
        ("pareto", refrandom.pareto, 100_000),
        ("lognormal", refrandom.lognormal, 50_000),
        ("gamma", lambda n: refrandom.gamma(n, 4), 50_000),
        ("chisquared", lambda n: refrandom.chisquared(n, 4), 50_000),
        ("normal_shifted", lambda n: refrandom.normal(n) + 6.0, 50_000),
    ]:
        raw = gen(n)
        data = np.minimum(np.maximum(raw, 0.0) * 1e6, 1e18).astype(np.uint64)
        hs = HG64(5).add_values(data).snapshot()
        data_sorted = np.sort(data)
        for q in (0.5, 0.99):
            est = int(hs.value_at_quantile(np.array([q]))[0])
            exact = int(data_sorted[int(q * n)])
            assert abs(est - exact) / max(exact, 1) <= 2.0**-5, (name, q)
        # mean matches the distribution's design (most have mean ~1 pre-scale)
        assert hs.population == n


def test_put_pro_rata_matches_reference_exactly():
    """tests/golden/put_output.txt: nonzero (sigbits, key, count) rows after
    six hg64_put range-inserts, produced by the compiled reference.  The
    Python put() must reproduce every counter exactly — including the
    carried-remainder arithmetic and the FP pro-rata truncation."""
    from hg64spark.hg64 import HG64

    cases = [
        (100, 100_000, 12_345),
        (0, 31, 1_000),
        (5, 5, 7),
        (1_000_000, 1_000_001, 999_999_937),
        (1, 1_000_000_000_000, 123_456_789),
        (4096, 8191, 64),
    ]
    golden: dict[int, dict[int, int]] = {}
    path = os.path.join(os.path.dirname(__file__), "golden", "put_output.txt")
    for line in open(path):
        sb, key, cnt = (int(x) for x in line.split())
        golden.setdefault(sb, {})[key] = cnt
    for sb in (1, 4, 7):
        hg = HG64(sb)
        for mn, mx, cnt in cases:
            hg.put(mn, mx, cnt)
        keys, _, _, counts = hg.to_buckets()
        mine = dict(zip(keys.tolist(), counts.tolist()))
        assert mine == golden[sb], f"sigbits={sb}"
