"""Locale-aware numeric parsing + unit-conversion kit (SURVEY P6,
P13, P14).

Models: decimal-comma / thousands-dot / 'N.A.' parsing
(/root/reference/crawler/netztransparenz.py:88-98,
/root/reference/crawler/ladesaeulenregister.py:46-52), the unit
conversions scattered through the crawlers and dashboards
(/root/reference/crawler/opec.py:82-86 USD/barrel→EUR/kWh,
/root/reference/crawler/ecmwf.py:153-156 wind speed,
/root/reference/crawler/regelleistung.py:548-575 MW→MWh,
weather.json ``temp_air-273.15``), and clip-at-bound
(/root/reference/crawler/ecmwf.py:162).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_NA_MARKERS = ("N.A.", "n.a.", "n/a", "N/A", "-", "", "NA")


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def parse_locale_number(
    col: Column | str,
    decimal: str = ",",
    thousands: str = ".",
    na_markers: tuple[str, ...] = DEFAULT_NA_MARKERS,
) -> Column:
    """Parse a localized numeric string ('1.234.567,89') to double.

    Spark's CSV reader has no ``decimal=','`` option (pandas does) —
    this is the post-parse scalar step. Pure string built-ins →
    codegen, vectorized.
    """
    s = F.trim(_c(col))
    s = F.when(s.isin(*na_markers), F.lit(None)).otherwise(s)
    if thousands:
        s = F.replace(s, F.lit(thousands), F.lit(""))
    if decimal != ".":
        s = F.replace(s, F.lit(decimal), F.lit("."))
    return s.cast("double")


def clip(col: Column | str, lower: float | None = None, upper: float | None = None) -> Column:
    """pandas ``clip`` — greatest/least keep it codegen'd."""
    c = _c(col)
    if lower is not None:
        c = F.greatest(c, F.lit(float(lower)))
    if upper is not None:
        c = F.least(c, F.lit(float(upper)))
    return c


def kelvin_to_celsius(col: Column | str) -> Column:
    return _c(col) - F.lit(273.15)


def wind_speed(u: Column | str, v: Column | str) -> Column:
    """√(u² + v²) from meridional/zonal components."""
    return F.sqrt(F.pow(_c(u), 2) + F.pow(_c(v), 2))


def usd_barrel_to_eur_kwh(usd_per_barrel: Column | str, usd_per_eur: Column | str) -> Column:
    """OPEC chain: barrel→litre (÷159), litre→kWh (÷10), USD→EUR."""
    return _c(usd_per_barrel) / _c(usd_per_eur) / 159.0 / 10.0


def mw_price_to_mwh(price_eur_mw: Column | str, hours: Column | str | float) -> Column:
    """Capacity price €/MW over a delivery period → €/MWh."""
    h = F.lit(float(hours)) if isinstance(hours, (int, float)) else _c(hours)
    return _c(price_eur_mw) / h


def quarter_hour_kwh_to_hourly(col: Column | str) -> Column:
    """15-min kWh reading → hourly rate (the smard.json ``mwh*4``)."""
    return _c(col) * 4
