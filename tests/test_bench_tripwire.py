"""Regression tripwire in bench.py (VERDICT r3 #5): a fresh value that drops
>5% below the committed previous-round BENCH_r*.json value must be flagged."""

import importlib.util
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(ROOT, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_tripwire_flags_5pct_drop(tmp_path, monkeypatch):
    bench = _load_bench()
    monkeypatch.setattr(bench, "HERE", str(tmp_path))
    with open(tmp_path / "BENCH_r07.json", "w") as f:
        json.dump({"parsed": {"value": 1000.0,
                              "arb": {"value": 500.0},
                              "train": {"value": 2000.0}}}, f)

    prev = bench.read_prev_round()
    assert prev == {"nacf": 1000.0, "arb": 500.0, "train": 2000.0,
                    "_source": "BENCH_r07.json"}

    ok = {"value": 960.0, "arb": {"value": 480.0}, "train": {"value": 1950.0}}
    bench.check_regression(ok)
    assert "regression" not in ok  # within 5%

    bad = {"value": 940.0, "arb": {"value": 501.0}, "train": {"value": 1800.0}}
    bench.check_regression(bad)
    assert set(bad["regression"]) == {"vs", "nacf", "train"}
    assert bad["regression"]["nacf"]["prev"] == 1000.0


def test_tripwire_picks_newest_round(tmp_path, monkeypatch):
    bench = _load_bench()
    monkeypatch.setattr(bench, "HERE", str(tmp_path))
    with open(tmp_path / "BENCH_r02.json", "w") as f:
        json.dump({"parsed": {"value": 100.0}}, f)
    with open(tmp_path / "BENCH_r10.json", "w") as f:
        json.dump({"parsed": {"value": 300.0}}, f)
    assert bench.read_prev_round()["nacf"] == 300.0


def test_tripwire_skips_unparseable_rounds(tmp_path, monkeypatch):
    bench = _load_bench()
    monkeypatch.setattr(bench, "HERE", str(tmp_path))
    with open(tmp_path / "BENCH_r02.json", "w") as f:
        json.dump({"parsed": {"value": 100.0}}, f)
    with open(tmp_path / "BENCH_r03.json", "w") as f:
        json.dump({"parsed": {"value": None, "error": "stale"}}, f)
    # r03 carries no usable number -> fall back to r02
    assert bench.read_prev_round()["nacf"] == 100.0


def test_record_arb_live_canonical_probe_and_large_batch(tmp_path):
    bench = _load_bench()
    p = str(tmp_path / "BENCH_LIVE_ARB.json")
    can = {"metric": "ARB ... B=1024 ...", "value": 7357.0, "mfu": 0.1,
           "timestamp": "t0"}

    # canonical protocol batch replaces the artifact
    bench._record_arb_live(dict(can), 1024, probe=False, path=p)
    assert json.load(open(p)) == can

    # probe runs (token dumps / precision A/Bs) never touch it
    bench._record_arb_live({"metric": "x", "value": 1, "mfu": 0,
                            "timestamp": "t"}, 1024, probe=True, path=p)
    assert json.load(open(p)) == can

    # a larger batch attaches as a secondary inside the canonical entry
    big = {"metric": "ARB ... B=4096 ...", "value": 9000.0, "mfu": 0.13,
           "timestamp": "t1", "tflops": 1.0}
    bench._record_arb_live(dict(big), 4096, probe=False, path=p)
    live = json.load(open(p))
    assert live["value"] == 7357.0
    assert live["large_batch"] == {"metric": big["metric"], "value": 9000.0,
                                   "mfu": 0.13, "timestamp": "t1"}

    # a fresh canonical run clears any stale large_batch
    bench._record_arb_live(dict(can, value=7400.0, large_batch={"old": 1}),
                           1024, probe=False, path=p)
    live = json.load(open(p))
    assert live["value"] == 7400.0 and "large_batch" not in live

    # large batch with no canonical artifact on disk: no-op
    os.remove(p)
    bench._record_arb_live(dict(big), 4096, probe=False, path=p)
    assert not os.path.exists(p)
