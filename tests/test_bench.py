"""bench.py smoke: the CPU baseline path runs and returns a sane rate."""

import sys

sys.path.insert(0, "/root/repo")


def test_bench_cpu_baseline_runs():
    import bench

    rate = bench.bench_cpu_baseline(n_steps=2)
    assert 0.1 < rate < 10000


def test_bench_constants_match_reference_defaults():
    import bench

    assert (bench.BATCH, bench.SEQ, bench.DIM, bench.HID) == (200, 16, 88, 88)
