"""Golden parser tests (SURVEY §5 layer 1): fixed sample payloads with
exact expected values, UTC-awareness, sort order, filters, and
malformed-input behavior — modeled on the reference's per-source test
strategy (src/testing/conftest.py:16-173)."""

from __future__ import annotations

import datetime as dt

from bigdatasmallprice_spark.sources.bafu import parse_hydro
from bigdatasmallprice_spark.sources.entsoe import (
    parse_crossborder_flows,
    parse_day_ahead_prices,
    parse_generation,
)
from bigdatasmallprice_spark.sources.openmeteo import parse_weather
from bigdatasmallprice_spark.sources.stadtwerk import parse_load_csvs, parse_pv_csv, parse_ts
from bigdatasmallprice_spark.sources.tariffs_json import parse_ckw, parse_ekz

UTC = dt.timezone.utc

ENTSOE_XML = """<?xml version="1.0" encoding="UTF-8"?>
<Publication_MarketDocument xmlns="urn:iec62325.351:tc57wg16:451-3:publicationdocument:7:3">
  <TimeSeries>
    <Period>
      <timeInterval><start>2026-02-28T00:00Z</start><end>2026-02-28T02:00Z</end></timeInterval>
      <resolution>PT60M</resolution>
      <Point><position>1</position><price.amount>85.50</price.amount></Point>
      <Point><position>2</position><price.amount>92.10</price.amount></Point>
    </Period>
  </TimeSeries>
</Publication_MarketDocument>"""


def test_entsoe_prices_golden():
    recs = parse_day_ahead_prices(ENTSOE_XML, "10YCH-SWISSGRIDZ")
    assert len(recs) == 2
    assert recs[0]["time"] == dt.datetime(2026, 2, 28, 0, 0, tzinfo=UTC)
    assert recs[0]["price_eur_mwh"] == 85.50
    assert recs[1]["time"] == dt.datetime(2026, 2, 28, 1, 0, tzinfo=UTC)
    assert recs[1]["price_eur_mwh"] == 92.10
    assert all(r["time"].tzinfo is not None for r in recs)


def test_entsoe_position_arithmetic_15min():
    xml = ENTSOE_XML.replace("PT60M", "PT15M").replace("price.amount", "quantity")
    recs = parse_generation(xml, "10YCH-SWISSGRIDZ", "B12")
    assert recs[1]["time"] - recs[0]["time"] == dt.timedelta(minutes=15)


def test_entsoe_default_resolution_and_gaps():
    xml = ENTSOE_XML.replace("<resolution>PT60M</resolution>", "").replace(
        "<position>2</position>", "<position>4</position>"
    )
    recs = parse_day_ahead_prices(xml, "X")
    # default 60-min; position 4 -> start + 3h (positions may skip)
    assert recs[1]["time"] == dt.datetime(2026, 2, 28, 3, 0, tzinfo=UTC)


def test_entsoe_empty_and_malformed():
    assert parse_day_ahead_prices("", "X") == []
    assert parse_day_ahead_prices("<not-xml", "X") == []
    assert parse_crossborder_flows("<a/>", "X", "Y") == []


def test_openmeteo_golden():
    j = """{"hourly": {"time": ["2026-03-01T00:00", "2026-03-01T01:00"],
        "temperature_2m": [4.2, 3.9], "wind_speed_10m": [10.1, 12.3],
        "shortwave_radiation": [0.0, 5.5], "cloud_cover": [88, 90],
        "precipitation": [0.1]}}"""
    recs = parse_weather(j, 47.5001, 8.7502)
    assert len(recs) == 2
    assert recs[0]["time"] == dt.datetime(2026, 3, 1, 0, 0, tzinfo=UTC)  # naive == UTC
    assert recs[0]["temperature_2m"] == 4.2
    assert recs[1]["precipitation_mm"] is None  # short array -> NULL
    assert recs[0]["latitude"] == 47.5001


def test_ekz_cet_to_utc_and_unit_filter():
    j1 = """{"prices": [
      {"start_timestamp": "2026-01-15T00:00:00+01:00",
       "electricity": [{"unit": "CHF_kWh", "value": 0.08}, {"unit": "Rp_kWh", "value": 8.0}],
       "integrated": [{"unit": "CHF_kWh", "value": 0.21}]},
      {"electricity": [{"unit": "CHF_kWh", "value": 0.99}]}
    ]}"""
    recs = parse_ekz(j1, "{}")
    # entry without start_timestamp skipped; Rp_kWh filtered out
    assert len(recs) == 2
    assert recs[0]["time"] == dt.datetime(2026, 1, 14, 23, 0, tzinfo=UTC)  # CET -> UTC
    assert {r["tariff_type"] for r in recs} == {"electricity", "integrated"}


def test_ckw_components():
    j = """{"prices": [{"start_timestamp": "2026-01-15T10:15:00+01:00",
      "grid_usage": [{"unit": "CHF_kWh", "value": 0.05}],
      "grid": [{"unit": "CHF_kWh", "value": 0.04}],
      "electricity": [{"unit": "CHF_kWh", "value": 0.09}],
      "integrated": [{"unit": "CHF_kWh", "value": 0.18}]}]}"""
    recs = parse_ckw(j)
    assert len(recs) == 4
    assert all(r["time"] == dt.datetime(2026, 1, 15, 9, 15, tzinfo=UTC) for r in recs)


def test_bafu_pivot_merge_and_sort():
    j = """{"payload": [
      {"timestamp": 1767225600, "loc": "2018", "par": "height", "val": 398.2},
      {"timestamp": 1767222000, "loc": "2018", "par": "flow", "val": 310.5},
      {"timestamp": 1767225600, "loc": "2018", "par": "flow", "val": 312.0},
      {"timestamp": 1767222000, "loc": "2018", "par": "ignored", "val": 1.0}
    ]}"""
    recs = parse_hydro(j, "2018")
    assert len(recs) == 2  # two timestamps, flow+height merged
    assert recs[0]["time"] < recs[1]["time"]  # ascending
    assert recs[0]["discharge_m3s"] == 310.5 and recs[0]["level_masl"] is None
    assert recs[1]["discharge_m3s"] == 312.0 and recs[1]["level_masl"] == 398.2


def test_stadtwerk_offset_spellings():
    # compact +0100 and extended +01:00 both normalize to UTC
    a = parse_ts("2026-01-15T06:00:00+0100")
    b = parse_ts("2026-01-15T06:00:00+01:00")
    assert a == b == dt.datetime(2026, 1, 15, 5, 0, tzinfo=UTC)


def test_stadtwerk_multifile_concat_flexible_column():
    f1 = "zeitpunkt,bruttolastgang_kwh\n2026-01-01T00:00:00+01:00,512.5\n"
    f2 = "zeitpunkt,lastgang\n2026-01-01T00:15:00+0100,498.0\nbad-ts,1.0\n"
    recs = parse_load_csvs([f1, f2])
    assert [r["load_kwh"] for r in recs] == [512.5, 498.0]
    assert recs[0]["time"] == dt.datetime(2025, 12, 31, 23, 0, tzinfo=UTC)


def test_stadtwerk_pv_filter():
    csv_text = (
        "zeitpunkt,energietraeger,lastgang_kwh\n"
        "2026-01-01T00:00:00+01:00,photovoltaik,12.5\n"
        "2026-01-01T00:00:00+01:00,wasserkraft,99.0\n"
    )
    recs = parse_pv_csv(csv_text)
    assert len(recs) == 1 and recs[0]["pv_kwh"] == 12.5


# ---------------------------------------------------------------------------
# tolerant ingestion / dead-letter routing (sources/tolerant.py)
# ---------------------------------------------------------------------------


def test_dead_letter_routing(spark):
    """One parse pass: valid rows come out typed; corrupt JSON and
    rows missing a required field land in the dead frame with reasons;
    nothing is lost or duplicated."""
    from bigdatasmallprice_spark.sources.tolerant import (
        dead_letter_summary,
        parse_json_with_dead_letters,
    )

    rows = [
        (1, '{"ts": "2026-01-01T00:00:00", "v": 1.5}'),
        (2, "{not json at all"),
        (3, '{"ts": null, "v": 3.0}'),           # required ts missing
        (4, '{"ts": "2026-01-02T00:00:00"}'),    # v absent -> null, but v not required
        (5, '"just a string"'),                  # valid JSON, wrong shape -> null struct fields
    ]
    raw = spark.createDataFrame(rows, "rec_id long, payload string")
    good, dead = parse_json_with_dead_letters(
        raw, "payload", "ts string, v double", required=["ts"]
    )
    g = {r.rec_id: (r.ts, r.v) for r in good.collect()}
    d = {r.rec_id: r.reason for r in dead.collect()}
    assert set(g) | set(d) == {1, 2, 3, 4, 5} and not (set(g) & set(d))
    assert g[1] == ("2026-01-01T00:00:00", 1.5)
    assert g[4] == ("2026-01-02T00:00:00", None)
    assert d[2] == "malformed_json"
    assert d[3] == "missing_required_field"
    assert d[5] in ("malformed_json", "missing_required_field")
    summ = {r.reason: r.n_records for r in dead_letter_summary(dead).collect()}
    assert sum(summ.values()) == 3


# ── WARC/WET ingest (sources/warc.py) ─────────────────────────────────────


def test_warc_roundtrip_binary_safe():
    """Payloads containing the record separator itself survive framing
    (Content-Length slicing, not delimiter splitting)."""
    from bigdatasmallprice_spark.sources.warc import encode_warc_gz, parse_warc_gz

    tricky = b"\r\n\r\nWARC/1.0\r\n\r\n" + bytes(range(256))
    recs = [
        ({"WARC-Type": "conversion", "WARC-Target-URI": "https://x/1"}, tricky),
        ({"WARC-Type": "response"}, b""),
        ({"WARC-Type": "conversion"}, b"plain text body"),
    ]
    got = parse_warc_gz(encode_warc_gz(recs))
    assert len(got) == 3
    assert got[0]["payload"] == tricky
    assert got[0]["headers"]["WARC-Target-URI"] == "https://x/1"
    assert got[1]["payload"] == b""
    assert got[2]["payload"] == b"plain text body"


def test_warc_members_are_individually_gzipped():
    """Each record is its own gzip member (splittable archives): the
    blob decompresses member-by-member, and a prefix cut at a member
    boundary still parses."""
    from bigdatasmallprice_spark.sources.warc import encode_warc_gz, parse_warc_gz

    recs = [({"WARC-Type": "conversion"}, bytes([i] * 10)) for i in range(4)]
    blob = encode_warc_gz(recs)
    # encoding is deterministic (mtime=0), so the first member is exactly
    # the single-record encoding — cut there and the prefix still parses
    member1 = encode_warc_gz(recs[:1])
    assert blob.startswith(member1) and len(member1) < len(blob)
    assert len(parse_warc_gz(member1)) == 1
    assert len(parse_warc_gz(blob)) == 4


def test_warc_distributed_matches_closed_form(spark):
    from bigdatasmallprice_spark.sources.warc import (
        synth_payload,
        synthesize_warc,
        warc_records,
    )

    docs = spark.range(0, 9).withColumnRenamed("id", "doc_id")
    out = {
        (r.archive_id, r.record_idx): r
        for r in warc_records(synthesize_warc(docs)).collect()
    }
    for a in range(9):
        for rec in range(1 + a % 3):
            p = synth_payload(a, rec)
            row = out[(a, rec)]
            assert row.content_length == len(p)
            assert row.payload_sum == sum(p)
            assert row.warc_type == "conversion"
            assert row.uri == f"https://example.org/{a}/{rec}"
    assert len(out) == sum(1 + a % 3 for a in range(9))
