"""Unit tests for bench.py's measurement helpers (no Ray, no timing).

bench.py is the driver-visible measurement surface; these pin the two
pure pieces a broken edit would silently corrupt: the /proc/stat steal
reader and the BASELINE.md measured-block replacement (which must
preserve appended "### " measurement-notes sections)."""

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "bench_module",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py"),
)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


def test_proc_stat_shape():
    steal, total = bench._proc_stat()
    assert isinstance(steal, int) and isinstance(total, int)
    # on this Linux box the cpu line must parse; steal is a component
    assert total > 0
    assert 0 <= steal <= total


def _fake(res_extra=None):
    res = {
        "n_docs": 100,
        "sf": "/tmp/sf",
        "cpus_lo": 8,
        "cpus_hi": 32,
        "sec_lo": 10.0,
        "sec_hi": 3.0,
        "docs_per_sec_lo": 10.0,
        "docs_per_sec_hi": 33.3,
        "value": 0.83,
        "pair_efficiencies": [0.8, 0.83, 0.9],
        "steal_pct_lo": 1.0,
        "steal_pct_hi": 2.0,
    }
    res.update(res_extra or {})
    lo = {"queries": {"extract": 10.0}}
    hi = {"queries": {"extract": 3.0}}
    return res, lo, hi


def test_update_baseline_md_inserts_and_replaces(tmp_path):
    path = str(tmp_path / "BASELINE.md")
    with open(path, "w") as f:
        f.write("# Title\n\nintro text\n")
    res, lo, hi = _fake()
    bench._update_baseline_md(res, lo, hi, path=path)
    text1 = open(path).read()
    assert "## Measured results (bench.py --scaling)" in text1
    assert "0.83" in text1 and "steal" in text1
    # appended notes section must survive a refresh; block must replace
    with open(path, "a") as f:
        f.write("\n### My notes (must survive)\n\n- a note\n")
    res2, lo2, hi2 = _fake({"value": 0.91})
    bench._update_baseline_md(res2, lo2, hi2, path=path)
    text2 = open(path).read()
    assert "0.91" in text2
    assert text2.count("## Measured results") == 1
    assert "### My notes (must survive)" in text2
    assert "- a note" in text2


def test_pick_attempt_steal_gate():
    """r5 (VERDICT r4 #5): the first sub-gate attempt counts; when every
    redraw sat under steal, the lowest-steal attempt counts (flagged) —
    a pair slot is never silently dropped."""
    import bench

    a1 = {"eff": 0.5, "steal": 12.0, "gated": True}
    a2 = {"eff": 0.95, "steal": 1.2, "gated": False}
    a3 = {"eff": 0.9, "steal": 2.0, "gated": False}
    assert bench._pick_attempt([a1, a2, a3]) is a2  # first clean wins
    assert bench._pick_attempt([a2]) is a2
    b1 = {"eff": 0.5, "steal": 12.0, "gated": True}
    b2 = {"eff": 0.7, "steal": 8.0, "gated": True}
    assert bench._pick_attempt([b1, b2]) is b2  # lowest steal, flagged
    assert bench._pick_attempt([b1, b2])["gated"] is True
