"""Energy calibration / correction transforms as Catalyst expressions.

Every operator here is an append-a-column expression factory parameterized by
a calibration dict whose values become literals in the plan (the reference
computes them per-partition in Python: sed/calibrator/energy.py). Staying in
expressions keeps the whole transform chain inside whole-stage codegen.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sed_binning_spark.sqlgen import fsql

# m_e/2 in eV * (ns/m)^2 — the reference's hard constant
# (sed/calibrator/energy.py:2369).
_TOF2EV_CONST = 2.84281e-12


# ---------------------------------------------------------------------------
# M3/M4/M5: TOF -> energy / ns conversions (energy.py:2338-2421)
# ---------------------------------------------------------------------------
def tof2ev_expr(
    t: str | Column,
    tof_distance: float,
    time_offset: float,
    binwidth: float,
    binning: int,
    energy_scale: str,
    energy_offset: float,
) -> Column:
    """``E = 2.84281e-12 * sign * (d / (t*binwidth*2^binning - t0))^2 + E0``
    (sed/calibrator/energy.py:2338-2374). ``t`` is upcast to double first,
    matching energy.py:870."""
    c = (F.col(t) if isinstance(t, str) else t).cast("double")
    sign = 1.0 if energy_scale == "kinetic" else -1.0
    tof_ns = c * F.lit(float(binwidth)) * F.lit(float(2.0**binning))
    # try_divide: an event whose TOF lands EXACTLY on the t0 pole gets a
    # NULL energy (rejected downstream like NaN) — under Spark's default
    # ANSI mode a plain division would abort the whole job on that one
    # row, where the reference's numpy evaluates to inf
    ratio = F.try_divide(
        F.lit(float(tof_distance)), tof_ns - F.lit(float(time_offset)),
    )
    return F.lit(_TOF2EV_CONST * sign) * ratio * ratio + F.lit(float(energy_offset))


def tof2ev_sql(
    t: str,
    tof_distance: float,
    time_offset: float,
    binwidth: float,
    binning: int,
    energy_scale: str,
    energy_offset: float,
) -> str:
    """DuckDB twin of :func:`tof2ev_expr`, same literal arithmetic."""
    sign = 1.0 if energy_scale == "kinetic" else -1.0
    ratio = (
        f"({fsql(tof_distance)} / (CAST({t} AS DOUBLE) * {fsql(binwidth)} * "
        f"{fsql(2.0 ** binning)} - {fsql(time_offset)}))"
    )
    return f"{fsql(_TOF2EV_CONST * sign)} * {ratio} * {ratio} + {fsql(energy_offset)}"


def tof2evpoly_expr(
    t: str | Column,
    poly_a: Sequence[float],
    energy_offset: float,
) -> Column:
    """Polynomial TOF->energy: ``E = sum_i a_i * t^i + E0`` with ``poly_a``
    given highest-order-first and NO constant term
    (sed/calibrator/energy.py:2377-2401: reversed coefficients multiply
    t^1..t^n). Built in the same ascending-power accumulation order."""
    c = (F.col(t) if isinstance(t, str) else t).cast("double")
    coeffs = list(np.asarray(poly_a, dtype=float)[::-1])  # ascending order, t^1 first
    energy: Column = F.lit(0.0)
    power = c
    for a in coeffs:
        energy = energy + F.lit(float(a)) * power
        power = power * c
    return energy + F.lit(float(energy_offset))


def tof2ns_expr(t: str | Column, binwidth: float, binning: int) -> Column:
    """``t_ns = t * 1e9 * binwidth * 2^binning``
    (sed/calibrator/energy.py:2404-2421)."""
    c = (F.col(t) if isinstance(t, str) else t).cast("double")
    return c * F.lit(1e9) * F.lit(float(binwidth)) * F.lit(float(2.0**binning))


def append_energy_axis(
    df: DataFrame,
    calibration: dict,
    tof_column: str = "t",
    energy_column: str = "energy",
) -> tuple[DataFrame, dict]:
    """Append the calibrated energy column using either the fit form
    (``calib_type='fit'``: d/t0/E0) or the poly form (``'poly'``: coeffs+E0)
    — reference apply_energy_calibration sed/calibrator/energy.py:853-885."""
    if tof_column not in df.columns:
        raise KeyError(f"TOF column {tof_column!r} not in dataframe")
    calib_type = calibration.get("calib_type")
    if calib_type is None:
        if {"d", "t0", "E0"} <= set(calibration):
            calib_type = "fit"
        elif {"coeffs", "E0"} <= set(calibration):
            calib_type = "poly"
        else:
            raise ValueError("No valid calibration parameters provided!")
    if calib_type == "fit":
        expr = tof2ev_expr(
            tof_column,
            tof_distance=calibration["d"],
            time_offset=calibration["t0"],
            binwidth=calibration.get("binwidth", 4.125e-12),
            binning=calibration.get("binning", 1),
            energy_scale=calibration.get("energy_scale", "kinetic"),
            energy_offset=calibration["E0"],
        )
    elif calib_type == "poly":
        expr = tof2evpoly_expr(tof_column, calibration["coeffs"], calibration["E0"])
    else:
        raise ValueError(f"Invalid calibration type: {calib_type}")
    return df.withColumn(energy_column, expr), {"calibration": dict(calibration)}


def append_tof_ns_axis(
    df: DataFrame,
    tof_column: str = "t",
    tof_ns_column: str = "t_ns",
    binwidth: float = 4.125e-12,
    binning: int = 1,
) -> tuple[DataFrame, dict]:
    """Append TOF-in-nanoseconds column (energy.py:893-938)."""
    if tof_column not in df.columns:
        raise KeyError(f"TOF column {tof_column!r} not in dataframe")
    out = df.withColumn(tof_ns_column, tof2ns_expr(tof_column, binwidth, binning))
    return out, {"binwidth": binwidth, "binning": binning}


# ---------------------------------------------------------------------------
# M6: TOF correction by 2-D profile around a center (energy.py:1313-1408,
# kernel :1670-1782)
# ---------------------------------------------------------------------------
def correction_expr(
    x: str | Column,
    y: str | Column,
    correction_type: str,
    center: tuple[float, float],
    amplitude: float,
    **kwds,
) -> Column:
    """The four closed-form correction profiles of correction_function
    (energy.py:1670-1782), as a single Column expression."""
    cx = (F.col(x) if isinstance(x, str) else x).cast("double")
    cy = (F.col(y) if isinstance(y, str) else y).cast("double")
    dx = cx - F.lit(float(center[0]))
    dy = cy - F.lit(float(center[1]))
    amplitude = float(amplitude)

    if correction_type == "spherical":
        if "diameter" not in kwds:
            raise ValueError(
                "Parameter 'diameter' required for correction type 'spherical' but not provided!",
            )
        d = float(kwds["diameter"])
        return -(
            (F.lit(1.0) - F.sqrt(F.lit(1.0) - (dx * dx + dy * dy) / F.lit(d**2)))
            * F.lit(100.0 * amplitude)
        )
    if correction_type == "Lorentzian":
        if "gamma" not in kwds:
            raise ValueError(
                "Parameter 'gamma' required for correction type 'Lorentzian' but not provided!",
            )
        g = float(kwds["gamma"])
        return F.lit(100000.0 * amplitude / (g * np.pi)) * (
            F.lit(g**2) / (dx * dx + dy * dy + F.lit(g**2)) - F.lit(1.0)
        )
    if correction_type == "Gaussian":
        if "sigma" not in kwds:
            raise ValueError(
                "Parameter 'sigma' required for correction type 'Gaussian' but not provided!",
            )
        s = float(kwds["sigma"])
        return F.lit(20000.0 * amplitude / np.sqrt(2 * np.pi * s**2)) * (
            F.exp(-(dx * dx + dy * dy) / F.lit(2 * s**2)) - F.lit(1.0)
        )
    if correction_type == "Lorentzian_asymmetric":
        if "gamma" not in kwds:
            raise ValueError(
                "Parameter 'gamma' required for correction type "
                "'Lorentzian_asymmetric' but not provided!",
            )
        g = float(kwds["gamma"])
        g2 = float(kwds.get("gamma2", g))
        a2 = float(kwds.get("amplitude2", amplitude))
        corr = F.lit(100000.0 * amplitude / (g * np.pi)) * (
            F.lit(g**2) / (dy * dy + F.lit(g**2)) - F.lit(1.0)
        )
        return corr + F.lit(100000.0 * a2 / (g2 * np.pi)) * (
            F.lit(g2**2) / (dx * dx + F.lit(g2**2)) - F.lit(1.0)
        )
    raise NotImplementedError(f"Correction type '{correction_type}' not implemented!")


def apply_energy_correction(
    df: DataFrame,
    correction: dict,
    tof_column: str = "t",
    new_tof_column: str = "tm",
    x_column: str = "X",
    y_column: str = "Y",
) -> tuple[DataFrame, dict]:
    """``t' = t + f(x, y)`` with f one of the four profiles
    (apply_energy_correction, energy.py:1313-1408)."""
    corr = dict(correction)
    ctype = corr.pop("correction_type")
    center = tuple(corr.pop("center"))
    amplitude = corr.pop("amplitude")
    expr = F.col(tof_column) + correction_expr(
        x_column, y_column, ctype, center, amplitude, **corr,
    )
    meta = {"correction": dict(correction)}
    return df.withColumn(new_tof_column, expr), meta


# ---------------------------------------------------------------------------
# M7: DLD sector alignment (energy.py:1428-1474)
# ---------------------------------------------------------------------------
def align_dld_sectors(
    df: DataFrame,
    sector_delays: Sequence[float],
    tof_column: str = "dldTimeSteps",
    sector_id_column: str = "dldSectorID",
) -> tuple[DataFrame, dict]:
    """``t' = (t - sector_delays[sectorID]).cast(float32)``
    (align_dld_sectors, energy.py:1428-1474). The delay table is tiny: an
    array-literal element_at lookup — pure expression, no join, no Python."""
    if sector_id_column not in df.columns:
        raise KeyError(f"sector column {sector_id_column!r} not in dataframe")
    delays = [float(d) for d in sector_delays]
    n = len(delays)
    arr = F.array(*[F.lit(d) for d in delays])
    sid = F.col(sector_id_column).cast("int")
    # element_at is 1-indexed; pmod gives numpy's negative-index wrap for
    # ids in [-n, n-1] (element_at's own negative handling is from-the-end
    # 1-indexed — off by one vs numpy). Out-of-range ids fail loudly like
    # the reference's delays[ids] IndexError would, instead of NULLing the
    # TOF (rows silently vanishing from every downstream histogram).
    valid = sid.isNotNull() & sid.between(-n, n - 1)
    lookup = F.when(valid, F.element_at(arr, F.pmod(sid, F.lit(n)) + 1)).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"sector id out of range [-{n}, {n - 1}]: "),
                F.coalesce(sid.cast("string"), F.lit("NULL")),
            ),
        ),
    )
    shifted = F.col(tof_column) - lookup
    out = df.withColumn(tof_column, shifted.cast("float"))
    return out, {"sector_delays": delays}


# ---------------------------------------------------------------------------
# Energy offsets wrapper (energy.py:1476-1646): delegates to
# offset_by_other_columns with the binding-scale sign flip.
# ---------------------------------------------------------------------------
def add_offsets(
    df: DataFrame,
    energy_column: str = "energy",
    columns: str | Sequence[str] | None = None,
    weights: float | Sequence[float] = 1.0,
    reductions: str | Sequence[str] | None = None,
    preserve_mean: bool | Sequence[bool] = False,
    constant: float | None = None,
    energy_scale: str = "kinetic",
) -> tuple[DataFrame, dict]:
    """Offset the energy axis by other columns and/or a constant, flipping
    signs on the binding-energy scale (energy.py:1525-1531, 1593-1641)."""
    from sed_binning_spark.core.dfops import offset_by_other_columns

    scale_sign = -1.0 if energy_scale == "binding" else 1.0
    meta: dict = {"applied": True, "energy_scale": energy_scale}
    if columns is not None:
        if isinstance(columns, str):
            columns = [columns]
        if isinstance(weights, (int, float)):
            weights = [float(weights)] * len(columns)
        weights = [scale_sign * float(w) for w in weights]
        df = offset_by_other_columns(
            df,
            target_column=energy_column,
            offset_columns=columns,
            weights=weights,
            reductions=reductions,
            preserve_mean=preserve_mean,
        )
        meta.update({"columns": list(columns), "weights": weights})
    if constant is not None:
        df = df.withColumn(
            energy_column,
            F.col(energy_column) + F.lit(scale_sign * float(constant)),
        )
        meta["constant"] = constant
    return df, meta


# ---------------------------------------------------------------------------
# F4 (driver-side): energy calibration fits, numpy-only
# ---------------------------------------------------------------------------
def poly_energy_calibration(
    pos: Sequence[float],
    vals: Sequence[float],
    order: int = 3,
    ref_id: int = 0,
    ref_energy: float | None = None,
    t: Sequence[float] | None = None,
    aug: int = 1,
    method: str = "lstsq",
    energy_scale: str = "kinetic",
) -> dict:
    """Polynomial TOF->energy calibration from bias-series feature positions
    (poly_energy_calibration, energy.py:2226-2335): solve the differential
    system ``T a = b`` where each T row is ``pos_ref^p - pos_i^p`` (ref row
    excluded) and ``b_i = vals_ref - vals_i``; then
    ``E0 = ref_energy - poly(pos_ref)``.

    Pure NumPy (the reference uses numpy.linalg.lstsq / scipy lsqr; lstsq
    covers both here).
    """
    pos = np.asarray(pos, dtype=float)
    vals = np.asarray(vals, dtype=float)
    if pos.size != vals.size:
        raise ValueError("pos and vals need to have the same number of elements")
    if ref_id >= vals.size:
        ref_id = vals.size - 1
    if ref_id < 0:
        # accept negative indices like the reference's scalar pos[ref_id]
        # (the slice form below would silently be empty for ref_id == -1);
        # anything below -size is out of range there too and must not wrap
        # around to a plausible-looking landmark
        if ref_id < -vals.size:
            raise ValueError(
                f"ref_id {ref_id} out of range for {vals.size} landmarks",
            )
        ref_id = int(ref_id) + vals.size

    polyorder = np.arange(order, 0, -1)
    term_ref = np.array([pos[ref_id] ** p for p in polyorder])
    others = np.delete(np.arange(vals.size), ref_id)
    t_sec = np.array([[pos[i] ** p for p in polyorder] for i in others])
    t_mat = np.tile(term_ref, (aug * others.size, 1)) - np.tile(t_sec, (aug, 1))
    bvec = np.tile(vals[ref_id] - vals[others], aug)
    poly_a = np.linalg.lstsq(t_mat, bvec, rcond=None)[0]

    ecalib = {
        "d": None,
        "t0": None,
        "coeffs": [float(a) for a in poly_a],
        "calib_type": "poly",
        "energy_scale": energy_scale,
        "offset": float(pos.min()),
        "Tmat": t_mat,
        "bvec": bvec,
    }
    if ref_energy is not None:
        # E0 pins the reference feature at ref_energy (energy.py:2329-2333)
        e_offset = tof2evpoly_np(poly_a, -float(ref_energy), pos[ref_id : ref_id + 1])[0]
        ecalib["E0"] = float(-e_offset)
        if t is not None:
            ecalib["axis"] = tof2evpoly_np(poly_a, float(-e_offset), np.asarray(t, dtype=float))
    return ecalib


def fit_energy_calibration(
    pos: Sequence[float],
    vals: Sequence[float],
    binwidth: float,
    binning: int,
    ref_energy: float,
    t: Sequence[float] | None = None,
    energy_scale: str = "kinetic",
    d0: float = 1.0,
    t0_0: float = 1e-6,
    ref_id: int | None = 0,
) -> dict:
    """Nonlinear fit of ``E = sign*2.84281e-12*(d/(t - t0))^2 + E0``
    (fit_energy_calibration, energy.py:2090-2224). The reference uses lmfit;
    here the problem is reduced to a 1-D profile over t0 (linear LSQ in
    (d^2, E0) at each candidate) under the reference's t0 upper bound —
    pure NumPy, deterministic, same model family. Returned (d, t0) are in
    the SECONDS units tof2ev_expr consumes.

    pos: TOF bin positions of features; vals: bias voltages (feature
    energies); ref_energy: energy of the reference feature. ``d0``/``t0_0``
    are accepted for signature compatibility (the profile scan needs no
    initial guess).
    """
    pos = np.asarray(pos, dtype=float)
    vals = np.asarray(vals, dtype=float)
    sign = 1.0 if energy_scale == "kinetic" else -1.0
    binw = float(binwidth) * 2.0**binning  # seconds per TOF step
    t_ns = pos * binw * 1e9  # the model below works in ns via tof2ev form

    # model E_i = sign*C*(d/(t_ns_i - t0))^2 + E0 (the reference fits it with
    # lmfit; energy.py:2149-2196). For FIXED t0 the model is LINEAR in
    # (d^2, E0), so the nonlinear problem is a 1-D profile over t0: scan t0
    # below the reference's bound t0 < (min(pos)-1)*binwidth*2^binning
    # (energy.py:2176-2181 — keeps the pole out of the data), linear-solve
    # each candidate, then parabolic-refine the best. Deterministic, no
    # Jacobians, immune to the pole-inside-axis local optima a free descent
    # can land in.
    def model(d, t0):
        return sign * _TOF2EV_CONST * (d / (t_ns - t0)) ** 2

    t0_max = (np.min(pos) - 1.0) * binw * 1e9
    span = float(t_ns.max() - t_ns.min()) or abs(t0_max) or 1.0

    def profile_sse(t0):
        """Best (d^2, E0) for this t0 via 2-param linear LSQ; returns
        (sse, d, e0) — d^2 < 0 candidates are rejected. The x column is
        unit-normalized before solving (raw magnitudes differ from the
        intercept by ~1e17, which would defeat lstsq's rank cutoff)."""
        x = sign * _TOF2EV_CONST / (t_ns - t0) ** 2
        sx = float(np.abs(x).max()) or 1.0
        a = np.stack([x / sx, np.ones_like(x)], axis=1)
        (u1, e0), *_ = np.linalg.lstsq(a, vals, rcond=None)
        u = u1 / sx
        if u < 0:
            return np.inf, 0.0, 0.0
        r = a @ np.array([u1, e0]) - vals
        return float(r @ r), float(np.sqrt(u)), float(e0)

    # geometric scan of the t0 offset below the bound, then two rounds of
    # linear refinement between the best point's grid neighbors
    offsets = np.geomspace(1e-4 * span, 50 * span, 400)
    sses = [profile_sse(t0_max - og) + (t0_max - og,) for og in offsets]
    k = int(np.argmin([s[0] for s in sses]))
    best = sses[k]
    lo = offsets[max(k - 1, 0)]
    hi = offsets[min(k + 1, len(offsets) - 1)]
    for _ in range(2):
        cands = [profile_sse(t0_max - og) + (t0_max - og,) for og in np.linspace(lo, hi, 64)]
        j = int(np.argmin([c[0] for c in cands]))
        if cands[j][0] < best[0]:
            best = cands[j]
        width = (hi - lo) / 16
        center = t0_max - best[3]
        lo, hi = max(center - width, offsets[0] * 0.1), center + width
    if not np.isfinite(best[0]):
        # every t0 candidate rejected (negative d^2): the bias/energy trend
        # contradicts the model sign. Returning the degenerate d=0 would
        # silently yield a CONSTANT energy axis downstream.
        raise ValueError(
            "energy calibration fit failed: no t0 candidate gives a "
            "physical (d^2 > 0) solution — check energy_scale "
            f"({energy_scale!r}) and the sign of the bias series",
        )
    _, d, e0, t0 = best

    # Pin E0 so the reference feature lands exactly at ref_energy
    # (energy.py:2205-2216): ref_id selects which landmark is the
    # reference; the default 0 (first landmark) matches the reference's
    # signature default — a None passed for compatibility means the same.
    pin = 0 if ref_id is None else int(ref_id)
    e0 = float(ref_energy - model(d, t0)[pin])
    # the fit runs in ns for conditioning; tof2ev_expr (and the reference's
    # tof2ev, energy.py:2338-2374) work in SECONDS — convert on output so
    # the dict plugs straight into append_energy_axis
    ecalib = {
        "d": float(d) * 1e-9,
        "t0": float(t0) * 1e-9,
        "E0": float(e0),
        "calib_type": "fit",
        "energy_scale": energy_scale,
        "binwidth": binwidth,
        "binning": binning,
    }
    if t is not None:
        t_ns_axis = np.asarray(t, dtype=float) * binw * 1e9
        ecalib["axis"] = sign * _TOF2EV_CONST * (d / (t_ns_axis - t0)) ** 2 + e0
    return ecalib


def tof2evpoly_np(poly_a, energy_offset: float, t: np.ndarray) -> np.ndarray:
    """NumPy twin of tof2evpoly (for driver-side calibration axes)."""
    coeffs = np.asarray(poly_a, dtype=float)[::-1]
    energy = np.zeros_like(t, dtype=float)
    power = np.asarray(t, dtype=float).copy()
    for a in coeffs:
        energy += a * power
        power = power * t
    return energy + energy_offset
