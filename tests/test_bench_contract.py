"""Contract tests for bench.py's driver-parsed stdout line.

BENCH_r05.json landed with ``"parsed": null`` because the rev-3
stdout line (per-key reps arrays + 24 variant keys) outgrew the
driver's ~2 KB tail capture — the head of the line, including the
headline value, was truncated away. Rev 4 moves everything bulky to
the BENCH_reps.json side file; these tests pin the stdout line's
size against the REAL headline key set so it can never silently
outgrow the capture again.

No SparkSession needed: the payload builder and key list are plain
Python.
"""

import json

import bench


def _worst_case_line(with_delta: bool) -> str:
    keys = bench.headline_keys()
    # Worst plausible widths: 4-digit seconds with 3 decimals per key,
    # 2-decimal delta ratios, sf as float.
    timings = {k: 9999.999 for k in keys}
    out = bench._stdout_payload(timings, "0.1", n_reps=3)
    # rev 5: the median-estimator total rides the stdout line too.
    out["value_median"] = 99999.999
    if with_delta:
        # Round 12: the stdout line carries the NORMALIZED deltas plus
        # the scalar ambient factor; raw delta_vs_prev lives in the
        # side file (raw = normalized x ambient_factor). Round 13: the
        # normalized deltas are median-based when the previous capture
        # is recoverable, flagged by delta_estimator.
        out["delta_vs_prev_normalized"] = {k: 99.99 for k in keys}
        out["ambient_factor"] = 99.999
        out["delta_estimator"] = "median"
        # Round 18: the scalar geomean of the normalized deltas rides
        # the stdout line too (VERDICT r17 #8).
        out["delta_vs_prev_normalized_geomean"] = 99.999
        out["delta_vs_prev_file"] = "BENCH_r99.json"
    return json.dumps(out)


def test_headline_key_set_shape():
    keys = bench.headline_keys()
    # The 25-key headline series is the round-over-round comparable
    # unit; growing it is allowed but must be a deliberate decision
    # (update this bound AND check the stdout-size test still holds).
    assert len(keys) == len(set(keys))
    assert 20 <= len(keys) <= 40


def test_stdout_line_under_tail_capture():
    # The driver's tail capture holds ~2 KB; the line must fit WITH
    # the optional delta_vs_prev field at worst-case number widths.
    assert len(_worst_case_line(with_delta=True)) < 2000


def test_stdout_line_has_driver_fields():
    out = json.loads(_worst_case_line(with_delta=False))
    for field in ("metric", "value", "unit", "queries", "sf",
                  "bench_rev", "n_reps"):
        assert field in out
    assert out["bench_rev"] >= 4
    assert out["unit"] == "sec"
    assert out["sf"] == 0.1
    # Bulky fields must NOT be on the stdout line.
    assert "reps" not in out
    assert "variants" not in out
    assert out["value"] == round(sum(out["queries"].values()), 3)


def test_canary_keys_are_headline_keys():
    # The ambient normalization divides by the canary trio's median
    # delta; the trio must stay inside the timed headline set (and be
    # plans no round edits — see bench.CANARY_KEYS docstring).
    keys = set(bench.headline_keys())
    assert set(bench.CANARY_KEYS) <= keys
    assert len(bench.CANARY_KEYS) >= 3


def test_geomean():
    # Pin the round-18 geomean field's math: geometric mean of the
    # positive deltas, zeros/negatives excluded, None when empty.
    assert bench.geomean([2.0, 0.5]) == 1.0
    assert bench.geomean([4.0]) == 4.0
    assert bench.geomean([1.0, 0.0, -3.0]) == 1.0
    assert bench.geomean([]) is None
    assert bench.geomean([0.0]) is None


def test_normalized_delta_math():
    # Pin the normalization contract: ambient = median of canary raw
    # deltas; normalized = raw / ambient. A zero-diff tree then lands
    # every key near 1.0 regardless of sandbox load.
    raw = dict(zip(bench.CANARY_KEYS, (1.10, 1.25, 1.40)))
    raw["other_key"] = 2.50
    ambient, normalized = bench.normalize_deltas(raw)
    assert ambient == 1.25
    assert normalized["other_key"] == 2.0
    # The canary median itself normalizes to 1.0 by construction.
    assert normalized[bench.CANARY_KEYS[1]] == 1.0


def test_normalized_delta_degenerate():
    # No canary keys in the delta set -> no normalization, no crash.
    ambient, normalized = bench.normalize_deltas({"x": 1.5})
    assert ambient == 0.0 and normalized is None
    ambient, normalized = bench.normalize_deltas(
        {k: 0.0 for k in bench.CANARY_KEYS})
    assert normalized is None
    # A LONE canary is one noisy sample, not an ambient median —
    # normalizing by it would let a single slow rep mask real
    # regressions (round-12 review find): refuse, same as absent.
    ambient, normalized = bench.normalize_deltas(
        {bench.CANARY_KEYS[0]: 2.0, "x": 1.0})
    assert ambient == 0.0 and normalized is None
    # Two canaries are enough for a median.
    ambient, normalized = bench.normalize_deltas(
        {bench.CANARY_KEYS[0]: 1.0, bench.CANARY_KEYS[1]: 2.0,
         "x": 3.0})
    assert ambient == 1.5 and normalized["x"] == 2.0


def test_load_prev_medians_verifies_same_capture(tmp_path, monkeypatch):
    """Median deltas must only ever be computed against the capture
    that produced the previous stdout record: same sf, rev >= 4, and
    every shared key's min-of-reps equal to the stdout min (3-dp). A
    stale side file (intra-round local run) fails the min check."""
    import os
    prev = {"sf": 0.1, "queries": {"a": 1.0, "b": 0.4}}
    side = {"bench_rev": 5, "sf": 0.1,
            "reps": {"a": [1.2, 1.0, 1.1], "b": [0.4, 0.5, 0.6]}}
    p = tmp_path / "BENCH_reps.json"
    p.write_text(json.dumps(side))
    monkeypatch.setattr(bench.os.path, "abspath",
                        lambda _: str(tmp_path / "bench.py"))
    got = bench._load_prev_medians(prev)
    assert got == {"a": 1.1, "b": 0.5}
    # sf mismatch -> None
    assert bench._load_prev_medians({"sf": 0.01,
                                     "queries": prev["queries"]}) is None
    # stale side file (min disagrees with the stdout record) -> None
    assert bench._load_prev_medians(
        {"sf": 0.1, "queries": {"a": 0.9, "b": 0.4}}) is None
    # old methodology rev -> None
    side["bench_rev"] = 3
    p.write_text(json.dumps(side))
    assert bench._load_prev_medians(prev) is None
