"""The printed bench line must stay under the driver's 2000-char tail
window NO MATTER how many base scalars the bench accumulates — the r12
driver record was lost to exactly this (the base calib/serving/health
fields alone serialized past the old assert and the budget loop only
ever trimmed queries).  These tests serialize the compact dict with
EVERY optional field populated at worst-case float widths."""

import json

import bench


def _worst_case_extras() -> dict:
    # every priority-listed field at a pessimistic width, plus a tail of
    # unlisted stragglers (future benches that forget to register)
    extras = {}
    for i, k in enumerate(bench.COMPACT_BASE_PRIORITY):
        extras[k] = round(-123456.789012 - i, 6)
    for i in range(30):
        extras[f"future_unlisted_scalar_with_a_long_name_{i:02d}"] = (
            round(-987654.321098 - i, 6)
        )
    return extras


def _worst_case_queries(n: int = 250) -> dict:
    return {
        f"emb_ann_filtered_per_query_variant_{i:03d}_check": (
            round(99999.999 - i, 3)
        )
        for i in range(n)
    }


def _core() -> dict:
    return {
        "metric": "declared_query_set_total_runtime",
        "value": 99999.999,
        "unit": "sec",
        "n_queries": 9999,
        "n_failed": 9999,
        "cold_total_sec": 99999.999,
        "nomemo_total_sec": 99999.999,
        "value_norm": 99999.999,
        "value_norm_jvm": 99999.999,
        "variance": -99.999,
        "queries_full": "BENCH_FULL.json",
        "sf": 0.001,
    }


def test_compact_line_fits_with_every_field_at_worst_case_width():
    line = bench.build_compact_line(
        _core(), _worst_case_extras(), _worst_case_queries())
    assert len(line) <= 2000, len(line)
    parsed = json.loads(line)
    # the cross-round essentials survive the squeeze
    for k in ("metric", "value", "unit", "value_norm", "n_queries",
              "n_failed", "sf", "queries_full"):
        assert k in parsed, k
    assert parsed["calib_jvm_sec"] is not None
    assert parsed["calib_par_sec"] is not None
    # the query reserve guarantees at least a handful of timings ride
    assert len(parsed["queries"]) >= 3


def test_compact_line_prefers_priority_fields_over_unlisted():
    line = bench.build_compact_line(
        _core(), _worst_case_extras(), _worst_case_queries())
    parsed = json.loads(line)
    # unlisted stragglers must never displace a priority field: if any
    # future_* made the line, every priority field did too
    if any(k.startswith("future_unlisted") for k in parsed):
        for k in bench.COMPACT_BASE_PRIORITY:
            assert k in parsed, k


def test_compact_line_all_fields_fit_when_room():
    # small field set → everything rides, queries included, no drops
    extras = {"calib_jvm_sec": 0.796, "calib_par_sec": 1.17,
              "ingest_events_per_sec": 658445}
    queries = {"q1": 1.234, "q2": 0.5}
    line = bench.build_compact_line(_core(), extras, queries)
    parsed = json.loads(line)
    assert parsed["ingest_events_per_sec"] == 658445
    assert parsed["queries"] == {"q1": 1.234, "q2": 0.5}


def test_compact_line_never_raises_even_at_tiny_cap():
    # pathological cap: the builder sheds instead of asserting — a
    # short valid line beats an rc-1 empty record
    line = bench.build_compact_line(
        _core(), _worst_case_extras(), _worst_case_queries(),
        budget=300, cap=400)
    assert len(line) <= 400
    parsed = json.loads(line)
    assert parsed["metric"] == "declared_query_set_total_runtime"


def test_compact_line_matches_r12_real_field_set():
    # the exact r12 BENCH_FULL base fields (the set that overflowed):
    # rebuilt from the committed artifact shape, worst-case widths
    import os
    full_path = os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "BENCH_FULL.json")
    if not os.path.exists(full_path):
        return
    full = json.load(open(full_path))
    extras = {
        k: -abs(v) - 0.000001 if isinstance(v, float) else v
        for k, v in full.items()
        if isinstance(v, (int, float)) and k not in _core()
    }
    queries = {k: round(v, 3) for k, v in sorted(
        full.get("queries", {}).items(), key=lambda kv: -kv[1])}
    line = bench.build_compact_line(_core(), extras, queries)
    assert len(line) <= 2000, len(line)
    json.loads(line)
