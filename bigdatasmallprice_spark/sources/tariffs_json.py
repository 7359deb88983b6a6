"""Swiss tariff-provider JSON parsers: EKZ, CKW, Groupe E (S7-S9).

Common public shape: ``prices: [{start_timestamp: ISO+01:00,
<component>: [{unit, value}, ...]}, ...]`` — 15-min entries in local
CET/CEST; components are unpivoted into (time, tariff_type,
price_chf_kwh) rows keeping only ``unit == 'CHF_kWh'`` entries
(reference src/data_collection/ekz_collector.py:33-93,
ckw_collector.py:23-87, groupe_e_collector.py:22-80).

Entries without a start_timestamp are skipped; local offsets normalize
to UTC (00:00+01:00 -> 23:00Z previous day).
"""

from __future__ import annotations

import datetime as dt
import json

CHF_UNIT = "CHF_kWh"

# provider -> component keys unpivoted to tariff_type rows
EKZ_COMPONENTS = ("electricity", "integrated")
CKW_COMPONENTS = ("grid_usage", "grid", "electricity", "integrated")
GROUPE_E_COMPONENTS = ("grid", "integrated")


def _parse_entry_time(iso: str | None) -> dt.datetime | None:
    if not iso:
        return None
    try:
        t = dt.datetime.fromisoformat(iso)
    except ValueError:
        return None
    if t.tzinfo is None:
        t = t.replace(tzinfo=dt.timezone.utc)
    return t.astimezone(dt.timezone.utc)


def parse_tariffs(json_text: str, components: tuple[str, ...]) -> list[dict]:
    """Unpivot each entry's components to (time, tariff_type, price) rows,
    keeping only CHF_kWh-denominated values (the unit filter P10)."""
    try:
        payload = json.loads(json_text) if json_text else {}
    except json.JSONDecodeError:
        return []
    out: list[dict] = []
    for entry in payload.get("prices") or []:
        t = _parse_entry_time(entry.get("start_timestamp"))
        if t is None:
            continue  # skipped, matching the reference collectors
        for comp in components:
            for item in entry.get(comp) or []:
                if item.get("unit") != CHF_UNIT or item.get("value") is None:
                    continue
                out.append(
                    {"time": t, "tariff_type": comp, "price_chf_kwh": float(item["value"])}
                )
    return out


def parse_ekz(electricity_json: str, integrated_json: str) -> list[dict]:
    """S7 — EKZ combines two API responses (dynamic + integrated_400D),
    the union-of-fetches shape (ekz_collector.py:53-71)."""
    return parse_tariffs(electricity_json, EKZ_COMPONENTS) + parse_tariffs(
        integrated_json, EKZ_COMPONENTS
    )


def parse_ckw(json_text: str) -> list[dict]:
    """S8 — CKW: 4 components per 15-min entry (ckw_collector.py:23-87)."""
    return parse_tariffs(json_text, CKW_COMPONENTS)


def parse_groupe_e(json_text: str) -> list[dict]:
    """S9 — Groupe E: 2 components, local-day range (groupe_e_collector.py:22-80)."""
    return parse_tariffs(json_text, GROUPE_E_COMPONENTS)
