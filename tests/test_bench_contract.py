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
    if with_delta:
        out["delta_vs_prev"] = {k: 99.99 for k in keys}
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
