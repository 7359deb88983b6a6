"""Dynamic tariff formulas as native Column expressions.

Re-expression of the reference's scalar tariff layer (reference
src/processing/tariff_formulas.py:26-170) as JVM-side column arithmetic —
no UDF, stays inside whole-stage codegen, vectorizes for free at scale.

  netzpreis    = clip(alpha * L_norm^2,  netz_std-5,    netz_std+15)
  L_norm       = clip((load-min)/(max-min), 0, 1)
  energiepreis = clip(k_pe * epex/10 + k_le, energie_std-5, energie_std+5)
  gesamttarif  = netzpreis + energiepreis

Defaults (Winterthur 2026 estimates per the reference): load in
[150, 900] kWh, netz_std=10, energie_std=8, alpha=15, k_pe=0.15,
k_le=2.0. Degenerate zero load-range returns the standard tariff
(golden tests: reference test_tariff_formulas.py:33-152).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_LOAD_MIN = 150.0
DEFAULT_LOAD_MAX = 900.0
DEFAULT_NETZ_STANDARD = 10.0
DEFAULT_ENERGIE_STANDARD = 8.0
DEFAULT_K_PE = 0.15
DEFAULT_K_LE = 2.0
DEFAULT_ALPHA = 15.0
NETZ_CLIP_DOWN = 5.0
NETZ_CLIP_UP = 15.0
ENERGIE_CLIP_DOWN = 5.0
ENERGIE_CLIP_UP = 5.0


def clip(c: Column, lo: Column | float, hi: Column | float) -> Column:
    """np.clip as greatest/least (JVM built-ins)."""
    lo = F.lit(lo) if not isinstance(lo, Column) else lo
    hi = F.lit(hi) if not isinstance(hi, Column) else hi
    return F.least(F.greatest(c, lo), hi)


def netzpreis(
    net_load: Column,
    load_min: float = DEFAULT_LOAD_MIN,
    load_max: float = DEFAULT_LOAD_MAX,
    standardtarif: float = DEFAULT_NETZ_STANDARD,
    alpha: float = DEFAULT_ALPHA,
    clip_down: float = NETZ_CLIP_DOWN,
    clip_up: float = NETZ_CLIP_UP,
) -> Column:
    load_range = load_max - load_min
    if load_range <= 0:
        return F.lit(float(standardtarif))
    l_norm = clip((net_load - F.lit(load_min)) / F.lit(load_range), 0.0, 1.0)
    raw = F.lit(alpha) * l_norm * l_norm
    return clip(raw, standardtarif - clip_down, standardtarif + clip_up)


def energiepreis(
    epex_eur_mwh: Column,
    k_pe: float = DEFAULT_K_PE,
    k_le: float = DEFAULT_K_LE,
    standardtarif: float = DEFAULT_ENERGIE_STANDARD,
    clip_down: float = ENERGIE_CLIP_DOWN,
    clip_up: float = ENERGIE_CLIP_UP,
) -> Column:
    raw = F.lit(k_pe) * (epex_eur_mwh / F.lit(10.0)) + F.lit(k_le)
    return clip(raw, standardtarif - clip_down, standardtarif + clip_up)


def gesamttarif(netz: Column, energie: Column) -> Column:
    return netz + energie


def traffic_light(gesamt_rp_kwh: Column) -> Column:
    """Bucket a tariff into low/medium/high (reference src/api/main.py:
    336-337: < 15 low, > 22 high, else medium)."""
    return (
        F.when(gesamt_rp_kwh < 15.0, F.lit("low"))
        .when(gesamt_rp_kwh > 22.0, F.lit("high"))
        .otherwise(F.lit("medium"))
    )
