#!/usr/bin/env python3
"""Throughput comparison harness: run the REFERENCE (pandas) versions of
graft's headline operators on the same sf0.1 data the Spark bench uses,
so BENCH numbers can be judged against real single-node reference times.

Reads the reference package from /root/reference (read-only) and the
driver-generated parquet. Tooling only — nothing here ships in the
library. Usage: python3 tools/ref_bench.py [sfDir]
"""
import sys, time, json, types
sys.path.insert(0, "/root/reference")
import pandas as pd
import numpy as np

# matplotlib is not installed in this container; the reference imports it
# at module scope for plotting we never invoke. Stub just enough.
_mpl = types.ModuleType("matplotlib")
_plt = types.ModuleType("matplotlib.pyplot")
_dates = types.ModuleType("matplotlib.dates")
_units = types.ModuleType("matplotlib.units")
_units.registry = {}
_dates.ConciseDateConverter = type("ConciseDateConverter", (), {})
_dates.date2num = lambda x: x
_mpl.pyplot = _plt
_mpl.dates = _dates
_mpl.units = _units
for name, mod in [("matplotlib", _mpl), ("matplotlib.pyplot", _plt),
                  ("matplotlib.dates", _dates), ("matplotlib.units", _units)]:
    sys.modules.setdefault(name, mod)

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ev = pd.read_parquet(f"{sf}/events.parquet")
ev["ts"] = ev["ts"].dt.floor("us")
results = {}

def timed(name):
    def deco(fn):
        t0 = time.time()
        fn()
        results[name] = round(time.time() - t0, 3)
    return deco

# A1: c_rolling 2h mean per user (utils.c_rolling applied per series)
@timed("ts_rolling_center")
def _():
    from utils import c_rolling
    for _, g in ev.groupby("user_id"):
        s = g.set_index("ts")["value"].sort_index()
        c_rolling(s, "2h")

# B1: DiurnalExtrema per user (diurnal.DiurnalExtrema plain mode)
@timed("diurnal_extrema")
def _():
    from diurnal import DiurnalExtrema
    import random as _r
    _r.seed(42)
    ok = bad = 0
    for _, g in ev.groupby("user_id"):
        # second-floor the index: the reference's to_exact_indexing
        # divides by the gap's whole-second component and crashes on
        # sub-second gaps (ns-resolution synthetic data); it still
        # crashes when the randomly-sampled gap is a whole number of
        # hours, so count per-series failures instead of aborting.
        s = g.set_index(g["ts"].dt.floor("s"))["value"].sort_index()
        s = s[~s.index.duplicated()]
        try:
            DiurnalExtrema(s, min_first=False, max_next_day=False,
                           generate_figure=False)
            ok += 1
        except ValueError:
            bad += 1
    results["diurnal_extrema_series_ok"] = ok
    results["diurnal_extrema_series_crashed"] = bad

# A3: daily resample per user
@timed("ts_resample_1d")
def _():
    for _, g in ev.groupby("user_id"):
        s = g.set_index("ts")["value"].sort_index()
        s.resample("1D").agg(["mean", "min", "max", "count"])

# C4-ish: velocity from binned medians (vectorized pandas analogue of
# gpstools.calc_velocity's median-window loop, generous to the reference)
@timed("gps_velocity")
def _():
    for _, g in ev.groupby("user_id"):
        s = g.set_index("ts")["value"].sort_index()
        med = s.resample("6h").median()
        (med.shift(-1) - med) / 0.25

# A5: linear interpolation per user with synthetic gaps
@timed("ts_interpolate")
def _():
    for _, g in ev.groupby("user_id"):
        g = g.sort_values("ts")
        v = g["value"].where(g["event_id"] % 10 != 0)
        v.index = g["ts"]
        v.interpolate(method="index")


# E2: daily albedo at solar noon (reference calc_albedo inner loop:
# c_rolling smoothing + per-day idxmax ratio, melt_model.py:408-448)
@timed("melt_albedo")
def _():
    from utils import c_rolling
    for _, g in ev.groupby("user_id"):
        g = g.sort_values("ts")
        inc = pd.Series((g["value"] * 2.0).values, index=g["ts"])
        refl = pd.Series((g["value"] * 2.0 * (0.35 + 0.05 * (g["event_id"] % 16))).values,
                         index=g["ts"])
        df = c_rolling(inc, "2h").to_frame(name="incoming")
        df["outgoing"] = c_rolling(refl, "2h")
        df.dropna(how="any", inplace=True)
        albedo = []
        for name, group in df.resample("D"):
            if not group.empty:
                albedo.append({"date": name, "albedo":
                    group["outgoing"][group["incoming"].idxmax()] / group["incoming"].max()})
        a = pd.DataFrame(albedo).set_index("date")["albedo"]
        a.loc[a >= 1] = None
        a = a.ffill()

# D3: atmospheric correction via as-of alignment (merge_asof is the
# optimized pandas path; the reference's index-alignment approach is
# strictly slower)
@timed("hydro_patm_correct")
def _():
    for _, g in ev.groupby("user_id"):
        g = g.sort_values("ts")
        water = g[g.event_type == "click"][["ts", "value"]].rename(columns={"value": "lvl"})
        atm = g[g.event_type == "purchase"][["ts", "value"]].rename(columns={"value": "p"})
        if water.empty or atm.empty:
            continue
        m = pd.merge_asof(water, atm, on="ts", direction="backward")
        p0 = atm["p"].iloc[0]
        m["corr"] = m["lvl"] * 0.05 - (m["p"] * 0.0102 - p0 * 0.0102)

# A8/A6: scalar column math (vectorized pandas; graft equivalents are
# codegen'd expressions)
@timed("ts_quadrature")
def _():
    np.sqrt(ev["value"] ** 2 + (ev["value"] * 0.5) ** 2)

@timed("ts_doy")
def _():
    idx = pd.DatetimeIndex(ev["ts"])
    from utils import DatetimeIndex_to_doy
    DatetimeIndex_to_doy(idx)
timings = {k: v for k, v in results.items() if not k.startswith("diurnal_extrema_series")}
print(json.dumps({"engine": "reference-pandas", "sf": sf, "queries": results,
                  "total": round(sum(timings.values()), 3)}))
