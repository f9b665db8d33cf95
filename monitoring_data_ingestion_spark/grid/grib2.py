"""Pure-Python GRIB edition-2 codec: sectioned messages, simple packing,
regex record matching — the reference's ``wgrib2`` input path.

The reference extracts GRIB2 records by inventory-string regex and count
limit (/root/reference/src/file-conversions.js:75-99: ``wgrib2 input
-match <regex> -limit <n> -grib out``). This module implements the
format surface that path needs, the same way ``grid/grib1.py`` covers
the ``wgrib`` edition-1 path:

* Section 0 (Indicator): "GRIB", discipline, edition 2, 64-bit length.
* Section 1 (Identification): centre, reference time (full 16-bit year).
* Section 3 (Grid definition): template 3.0 — regular lat/lon grid,
  Ni×Nj, first-point lat/lon and increments in MICROdegrees (GRIB2's
  10^-6 resolution vs GRIB1's millidegrees), scanning modes 0x00/0x40;
  template 3.40 — global GAUSSIAN grid (ECMWF F-grids, ERA5's
  native geometry): the Dj octets carry N and row latitudes are the
  arcsin roots of Legendre P_2N (:func:`gaussian_latitudes`), in both
  the regular and the REDUCED form (Ni coded missing + the section-3
  points-per-parallel list; ragged values stay flat);
  templates 3.30 — LAMBERT CONFORMAL conic (HRRR/NAM regional
  archives) —, 3.20 — north POLAR STEREOGRAPHIC (sea-ice / Arctic
  products) — and 3.10 — MERCATOR (tropical products): per-cell
  geographic coordinates recovered through the spherical Snyder
  inverses (:func:`lambert_inverse`, :func:`polar_stereo_inverse`,
  :func:`mercator_inverse`), northern aspect for the conic/azimuthal
  forms, values kept in storage order; templates 3.2/3.3 — STRETCHED
  (and stretched+rotated) lat/lon, the ARPEGE/ALADIN Schmidt geometry:
  the pole of stretching + ×10^6 factor decode through the vectorized
  :func:`schmidt_unstretch` (tan-half-colatitude radial scaling about
  the pole, c > 1 concentrating true resolution there), composed with
  the shared unrotation for 3.3 — completing the lat/lon family
  3.0/3.1/3.2/3.3; template 3.50 — SPHERICAL
  HARMONIC coefficients (ERA5/IFS native spectral archives):
  triangular truncation J = K = M, associated-Legendre type 1,
  mode-1 complex ordering, pairing with data representation
  template 5.50 (the (0,0) real part unpacked in the template, every
  other value simple-packed) and synthesizing to a Gaussian grid
  through :func:`spectral_synthesis` / :func:`spectral_legendre` —
  never an implicit georef.
* Section 4 (Product definition): template 4.0 — parameter category +
  number, the pair wgrib2 inventory strings name; 4.8 — statistical
  processing over a time interval (process code + interval end); 4.1 /
  4.11 — individual ensemble member (type, perturbation number,
  ensemble size), 4.11 with the statistical block following the three
  ensemble octets; 4.2/4.12 — derived-ensemble products; 4.3/4.4 and
  4.13/4.14 — cluster-derived products (rectangular/circular domains,
  the 4.13/4.14 statistical block at a VARIABLE offset after the
  member list); 4.5/4.9 — probability, 4.6/4.10 — percentile, 4.7 —
  analysis/forecast error (4.0's layout, distinguished only by the
  surfaced product_template), 4.15 — spatio-statistical processing;
  4.31/4.32 — satellite products (observational / simulated imagery)
  whose contributing-spectral-band list stands where the family's
  fixed-surface octets would be (4.31 carries no lead octets either);
  4.33/4.34 — ensemble simulated satellite (4.32's leading layout,
  the three 4.1-style ensemble octets AFTER the band list, 4.34's
  statistical block at a VARIABLE offset after those); 4.20 — radar
  products (site-based layout: site coordinates/elevation/ids and
  operating mode; no fixed surfaces, no lead octets); 4.30 — the
  DEPRECATED satellite form (4.31's layout with a band block one
  octet NARROWER per band — instrument type is 1 octet, not 2 — so
  each template decodes through its own band width; pre-2003 archives
  still carry it); 4.40-4.43 — atmospheric chemistry (the CAMS
  family: the 2-octet code-table-4.230 constituent type inserted
  after the parameter number, composing the plain / ensemble /
  statistical / ensemble-statistical base forms) and 4.44-4.48 —
  aerosol (code-table-4.233 type + code-table-4.91 size interval with
  signed-magnitude (scale, value) bounds; 4.48/4.49 add the optical
  wavelength interval, 4.49 the ensemble form) — both parsed by
  SPLICING the inserted block out so the remainder decodes through
  the base template's exact offsets; 4.60/4.61 — individual ensemble
  REFORECAST (4.1/4.11 plus the model-version date appended after the
  ensemble octets, 4.61's statistical block seven octets past
  4.11's — the GEFS v12 reforecast archive form).
* Section 5 (Data representation): template 5.0 (simple packing with an
  IEEE 754 binary32 reference value — GRIB2 dropped GRIB1's IBM float,
  signed-magnitude binary/decimal scale factors, nbits), template 5.2
  (complex packing: general group splitting with per-group reference/
  width, optional missing-value management 1 — in-data all-ones
  substitution instead of a bitmap — or 2, where the top TWO codes at
  each width mark primary/secondary missing and the section-5
  secondary substitute lands raw), template 5.3 (complex packing with
  first- or second-order spatial differencing — the packing GFS and
  most operational GRIB2 archives actually use; composes with both
  missing-value managements by differencing the non-missing
  subsequence only), template 5.4 (IEEE floating-point data — raw
  binary32/binary64, no reference/scales/width), template 5.40
  (JPEG2000: the scaled field as one lossless raw codestream,
  grid/jpeg2000.py), template 5.41 (PNG, grid/png.py), template 5.42
  (CCSDS 121.0 / AEC lossless Rice coding on the from-scratch
  grid/aec.py codec — the packing post-2022 NCEP GFS output ships),
  template 5.200 (run length with level values — the JMA
  radar-composite packing: a level table in section 5, level-0
  missing cells, base-LNGU run digits LSB-first per JMA Technical
  Information No. 215), and template 5.61 (simple packing with
  logarithm pre-processing:
  Z = ln(Y + B), the ECMWF precipitation form).
* Section 6 (Bitmap): indicator 255 = none, 0 = bitmap present, 254 =
  the previously defined bitmap applies (multi-field messages; resolved
  by substitution in ``_iter_field_sections``).
* Section 7 (Data): big-endian bit-packed increments,
  Y = (R + X·2^E) / 10^D — the same simple-packing formula as GRIB1;
  templates 7.2/7.3 carry grouped increments (+ initial values and the
  difference minimum for 7.3) as laid out in _build_complex_s57.
* Section 8: "7777".

Record matching parity: :func:`inventory_line` renders a wgrib2-style
``d{discipline}:c{category},n{number}:l{level type}/{level}[-{level2}]
:{YYYYMMDDHH}:f{lead hours}`` string per record (``-`` where a field
is coded missing or non-renderable; the authoritative rendering is
:func:`_field_inventory`) and :func:`match_records` selects by regex
with an optional count limit — ``wgrib2 -match -limit`` as a pure
function over the scanned file.

All encode/decode arithmetic is stated closed-form (see grib1.py's
module docstring); integer-valued grids with E=0, D=0 and an
integer-exact float32 reference decode BIT-EXACTLY.
"""

from __future__ import annotations

import functools
import math
import re
import struct
from dataclasses import dataclass

import numpy as np

# GRIB2 shares GRIB1's bit packing and signed-magnitude 16-bit encoding
# (both big-endian, top bit = sign) — one implementation, two editions.
from .grib1 import _pack_bits, _rs16 as _rs16be, _s16 as _s16be, _unpack_bits
from .grib1 import loud_truncation
from .grib1 import quantize_simple_packing

MAGIC = b"GRIB"
TERMINATOR = b"7777"
EDITION = 2


def _f32_encode(x: float) -> bytes:
    return struct.pack(">f", float(np.float32(x)))


def _f32_encode_floor(x: float) -> bytes:
    """Largest float32 ≤ x (see grib1.ibm32_encode_floor for why the
    reference value must round toward −∞)."""
    f = np.float32(x)
    if float(f) > x:
        f = np.nextafter(f, np.float32(-np.inf))
    return struct.pack(">f", float(f))


def _f32_decode(b: bytes) -> float:
    return struct.unpack(">f", b)[0]


def _s32be(n: int) -> bytes:
    """Signed-magnitude 32-bit (GRIB2 lat/lon in microdegrees) — the
    width-4 case of :func:`_signed_magnitude` (defined below; bound at
    call time)."""
    if abs(int(n)) >= 1 << 31:
        raise ValueError("signed-magnitude 32-bit overflow")
    return _signed_magnitude(int(n), 4)


def _rs32be(b: bytes, off: int) -> int:
    mag = ((b[off] & 0x7F) << 24) | (b[off + 1] << 16) | (b[off + 2] << 8) | b[off + 3]
    return -mag if b[off] & 0x80 else mag


@functools.lru_cache(maxsize=64)
def gaussian_latitudes(nj: int) -> np.ndarray:
    """Latitudes (degrees, north -> south) of the global regular
    Gaussian grid with ``nj`` parallels — arcsin of the roots of the
    Legendre polynomial P_nj, the quadrature nodes ECMWF F-grids (and
    ERA5's native grid) are built on.  Newton-Raphson from the
    classical cosine initial guess, P_n and P'_n by the Bonnet
    three-term recurrence; converges to ~1e-15 in a handful of steps.

    Memoized per grid (a landing scan decodes thousands of records on
    ONE grid); the returned array is read-only — copy before mutating.
    """
    if nj < 2 or nj % 2:
        raise ValueError("a global Gaussian grid has an even parallel count")
    n = int(nj)
    k = np.arange(1, n + 1, dtype=np.float64)
    x = np.cos(np.pi * (k - 0.25) / (n + 0.5))
    for _ in range(100):
        p_prev = np.ones_like(x)
        p_cur = x.copy()
        for m in range(2, n + 1):
            p_prev, p_cur = p_cur, ((2 * m - 1) * x * p_cur - (m - 1) * p_prev) / m
        deriv = n * (x * p_cur - p_prev) / (x * x - 1.0)
        step = p_cur / deriv
        x = x - step
        if float(np.max(np.abs(step))) < 1e-15:
            break
    lats = np.degrees(np.arcsin(x))  # k=1 root is nearest +1 -> north first
    lats.flags.writeable = False  # shared cached instance
    return lats


def _lambert_setup(lad_deg, latin1_deg, latin2_deg, radius_m):
    """Cone constant n, scaled F·R, and the rho at the LaD origin
    latitude of a spherical Lambert conformal conic (Snyder 1987
    eq. 15-1..15-4, tan-power form). Northern-cone only (n > 0); the
    LoV meridian offset applies in forward/inverse, not here."""
    p1 = math.radians(latin1_deg)
    p2 = math.radians(latin2_deg)
    if abs(p1 - p2) < 1e-12:
        n = math.sin(p1)
    else:
        n = math.log(math.cos(p1) / math.cos(p2)) / math.log(
            math.tan(math.pi / 4 + p2 / 2) / math.tan(math.pi / 4 + p1 / 2)
        )
    if n <= 0:
        raise ValueError("southern-cone Lambert grids not supported")
    rf = radius_m * math.cos(p1) * math.tan(math.pi / 4 + p1 / 2) ** n / n
    rho0 = rf / math.tan(math.pi / 4 + math.radians(lad_deg) / 2) ** n
    return n, rf, rho0


def lambert_forward(lat_deg, lon_deg, lad_deg, lov_deg, latin1_deg,
                    latin2_deg, radius_m):
    """(lat, lon) degrees -> projected (x, y) metres with the origin at
    (LaD, LoV).  Accepts scalars or numpy arrays."""
    n, rf, rho0 = _lambert_setup(lad_deg, latin1_deg, latin2_deg, radius_m)
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    dlon = np.radians(
        (np.asarray(lon_deg, dtype=np.float64) - lov_deg + 180.0) % 360.0 - 180.0
    )
    rho = rf / np.tan(np.pi / 4 + lat / 2) ** n
    theta = n * dlon
    return rho * np.sin(theta), rho0 - rho * np.cos(theta)


def lambert_inverse(x_m, y_m, lad_deg, lov_deg, latin1_deg, latin2_deg,
                    radius_m):
    """Projected (x, y) metres -> (lat, lon) degrees; exact inverse of
    :func:`lambert_forward` (Snyder eq. 14-9..14-11)."""
    n, rf, rho0 = _lambert_setup(lad_deg, latin1_deg, latin2_deg, radius_m)
    x = np.asarray(x_m, dtype=np.float64)
    y = np.asarray(y_m, dtype=np.float64)
    rho = np.hypot(x, rho0 - y)
    theta = np.arctan2(x, rho0 - y)
    with np.errstate(divide="ignore"):
        lat = 2.0 * np.arctan((rf / rho) ** (1.0 / n)) - np.pi / 2
    lat = np.where(rho == 0.0, np.pi / 2, lat)  # the pole itself
    lon = lov_deg + np.degrees(theta / n)
    lon = (lon + 180.0) % 360.0 - 180.0
    return np.degrees(lat), lon


def polar_stereo_forward(lat_deg, lon_deg, lad_deg, lov_deg, radius_m):
    """(lat, lon) degrees -> north-polar stereographic (x, y) metres,
    true scale at LaD, y axis along LoV away from the pole (Snyder
    eq. 21-1..21-4, tangent-half-angle form)."""
    k2 = 1.0 + math.sin(math.radians(lad_deg))  # = 2·k0
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    dlon = np.radians(
        (np.asarray(lon_deg, dtype=np.float64) - lov_deg + 180.0) % 360.0 - 180.0
    )
    rho = radius_m * k2 * np.tan(np.pi / 4 - lat / 2)
    return rho * np.sin(dlon), -rho * np.cos(dlon)


def polar_stereo_inverse(x_m, y_m, lad_deg, lov_deg, radius_m):
    """Exact inverse of :func:`polar_stereo_forward` (Snyder
    eq. 20-14..20-16, polar aspect)."""
    k2 = 1.0 + math.sin(math.radians(lad_deg))
    x = np.asarray(x_m, dtype=np.float64)
    y = np.asarray(y_m, dtype=np.float64)
    rho = np.hypot(x, y)
    lat = np.pi / 2 - 2.0 * np.arctan(rho / (radius_m * k2))
    lon = lov_deg + np.degrees(np.arctan2(x, -y))
    lon = (lon + 180.0) % 360.0 - 180.0
    return np.degrees(lat), lon


def mercator_forward(lat_deg, lon_deg, lad_deg, radius_m):
    """(lat, lon) degrees -> spherical Mercator (x, y) metres, true
    scale at LaD (x = R cos(LaD) dλ, y = R cos(LaD) ψ with ψ the
    isometric latitude)."""
    k = radius_m * math.cos(math.radians(lad_deg))
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    x = k * np.radians(np.asarray(lon_deg, dtype=np.float64))
    y = k * np.log(np.tan(np.pi / 4 + lat / 2))
    return x, y


def mercator_inverse(x_m, y_m, lad_deg, radius_m):
    """Exact inverse of :func:`mercator_forward` (exp/atan form)."""
    k = radius_m * math.cos(math.radians(lad_deg))
    lat = 2.0 * np.arctan(np.exp(np.asarray(y_m, dtype=np.float64) / k)) - np.pi / 2
    lon = np.degrees(np.asarray(x_m, dtype=np.float64) / k)
    lon = (lon + 180.0) % 360.0 - 180.0
    return np.degrees(lat), lon


def rotated_unrotate(rlats_deg, rlons_deg, sp_lat_deg, sp_lon_deg, angle_deg):
    """ROTATED lat/lon grid (GDT 3.1 — the COSMO/HIRLAM regional
    geometry): rotated coordinates → true coordinates, vectorized.

    Convention (the standard eccodes/COSMO/wgrib2 one, documented
    because GRIB only codes the pole, not the composition order): the
    rotated system's NORTH pole sits at the antipode of the coded
    SOUTHERN pole — (φ_N, λ_N) = (−sp_lat, sp_lon + 180°) — the angle
    of rotation γ turns the grid about the rotated polar axis
    (counterclockwise seen from the rotated north pole) BEFORE the
    pole tilt, and true longitudes come out measured from the coded
    southern-pole longitude itself.  An unrotated grid is therefore
    (sp_lat, sp_lon, γ) = (−90°, 0°, 0).  Matrix formulation
    v_true = Rz(sp_lon) · Ry(φ_N − 90°) · Rz(γ) · v_rot — anchored by
    the standard transform example: rotated (0°, 0°) under a coded
    southern pole of (−40°, 10°E) is true (50°N, 10°E).  The query
    oracle restates the same convention through the direct
    arcsin/atan2 spherical formulas — formulation-level independence,
    like the Snyder-vs-isometric Lambert pair."""
    phi = np.radians(np.asarray(rlats_deg, dtype=np.float64))
    lam = np.radians(np.asarray(rlons_deg, dtype=np.float64))
    x = np.cos(phi) * np.cos(lam)
    y = np.cos(phi) * np.sin(lam)
    z = np.sin(phi)
    g = math.radians(angle_deg)
    xg = x * math.cos(g) - y * math.sin(g)
    yg = x * math.sin(g) + y * math.cos(g)
    phi_n = math.radians(-sp_lat_deg)
    lam_p = math.radians(sp_lon_deg)
    xt = xg * math.sin(phi_n) - z * math.cos(phi_n)
    zt = xg * math.cos(phi_n) + z * math.sin(phi_n)
    xr = xt * math.cos(lam_p) - yg * math.sin(lam_p)
    yr = xt * math.sin(lam_p) + yg * math.cos(lam_p)
    lat = np.degrees(np.arcsin(np.clip(zt, -1.0, 1.0)))
    lon = np.degrees(np.arctan2(yr, xr))
    lon = (lon + 180.0) % 360.0 - 180.0
    return lat, lon


def spectral_legendre(truncation: int, mu) -> np.ndarray:
    """Fully-normalized associated Legendre functions P̄_n^m(μ) for all
    0 ≤ m ≤ n ≤ T at the points ``mu`` — the normalization spectral
    GRIB data uses (code table 3.6 representation type 1):
    P̄_n^m = sqrt((2n+1)·(n−m)!/(n+m)!) · P_n^m WITHOUT the
    Condon–Shortley phase, so ∫₋₁¹ (P̄_n^m)² dμ = 2 and P̄_0^0 ≡ 1.
    Computed by the stable diagonal-then-upward three-term recurrence
    (sectoral seed, then increasing degree at fixed order — the
    classic spectral-model scheme); the query oracle recomputes the
    same functions from the DERIVATIVE definition
    P_n^m = (1−μ²)^{m/2} dᵐPₙ/dμᵐ with explicit factorials —
    formulation-level independence, like the Snyder/isometric pair.

    Returns shape (T+1, T+1, len(mu)) indexed [m, n, point]; entries
    with n < m are zero."""
    mu = np.asarray(mu, dtype=np.float64).reshape(-1)
    t = int(truncation)
    out = np.zeros((t + 1, t + 1, mu.size))
    s = np.sqrt(np.maximum(0.0, 1.0 - mu * mu))
    pmm = np.ones_like(mu)  # P̄_0^0
    for m in range(t + 1):
        out[m, m] = pmm
        if m + 1 <= t:
            out[m, m + 1] = math.sqrt(2.0 * m + 3.0) * mu * pmm
        for n in range(m + 2, t + 1):
            a = math.sqrt((4.0 * n * n - 1.0) / (n * n - m * m))
            b = math.sqrt(
                ((n - 1.0) ** 2 - m * m) / (4.0 * (n - 1.0) ** 2 - 1.0)
            )
            out[m, n] = a * (mu * out[m, n - 1] - b * out[m, n - 2])
        if m + 1 <= t:
            pmm = math.sqrt((2.0 * m + 3.0) / (2.0 * m + 2.0)) * s * pmm
    return out


def schmidt_unstretch(lats_deg, lons_deg, sp_lat_deg, sp_lon_deg, factor):
    """STRETCHED lat/lon grid (GDT 3.2/3.3 — the ARPEGE/ALADIN Schmidt
    geometry): stretched coordinates → true coordinates, vectorized.

    Convention (documented because GRIB codes only the pole of
    stretching and the factor): the Schmidt (1977) transformation is a
    RADIAL SCALING of the polar stereographic projection about the
    pole of stretching — a point at stereographic radius r in the
    stretched (computational) system sits at radius r/c in the true
    system, so a factor c > 1 CONCENTRATES true resolution near the
    pole of stretching (the ARPEGE direction: a uniform computational
    grid is fine over the pole region, coarse at the antipode).  In
    the pole frame that is the half-angle colatitude form
        tan(χ_true/2) = tan(χ'/2) / c
    (equivalently the closed sin form sin φ_t =
    ((c²−1)+(c²+1)·sin φ')/((c²+1)+(c²−1)·sin φ'), which is
    ill-conditioned within ~1e-4° of the pole — see the inline note)
    with longitudes unchanged; for a general pole the engine rotates
    the pole of stretching to the north pole by 3-D matrix
    composition, applies the 1-D colatitude map, and rotates back —
    c = 1 is the identity everywhere.  The query oracle reaches the
    same map through independent machinery — spherical law of cosines
    for the colatitude, bearing-from-pole, destination-point formula
    (plans/grid_spectral_q.py::_unstretch_trig) — formulation independence in
    the composition, like the rotation/Lambert pairs."""
    phi = np.radians(np.asarray(lats_deg, dtype=np.float64))
    lam = np.radians(np.asarray(lons_deg, dtype=np.float64))
    c = float(factor)
    if not c > 0.0:
        raise ValueError(f"stretching factor {factor} must be positive")
    x = np.cos(phi) * np.cos(lam)
    y = np.cos(phi) * np.sin(lam)
    z = np.sin(phi)
    # rotate the pole of stretching to the north pole:
    # Ry(90°−φ_s) · Rz(−λ_s)
    lam_s = math.radians(sp_lon_deg)
    th = math.radians(90.0 - sp_lat_deg)
    x1 = x * math.cos(lam_s) + y * math.sin(lam_s)
    y1 = -x * math.sin(lam_s) + y * math.cos(lam_s)
    x2 = x1 * math.cos(th) - z * math.sin(th)
    z2 = x1 * math.sin(th) + z * math.cos(th)
    # Schmidt latitude map in the pole frame via the HALF-ANGLE
    # colatitude form: χ = 2·atan2(hypot, 1+z) (exact on the unit
    # sphere), tan(χ_t/2) = tan(χ/2)/c, then z = cos(χ_t) and the
    # in-plane rescale sin(χ_t)/sin(χ) → 1/c as χ → 0 — perfectly
    # conditioned at the pole of stretching.  The closed sin form
    # (sin φ_t = ((c²−1)+(c²+1)s)/((c²+1)+(c²−1)s)) is the SAME map,
    # but reconstructing the in-plane components from sqrt(1−s²)
    # cancels catastrophically within ~1e-4° of the pole (the r11
    # property-test failure); the half-angle form round-trips to
    # <1e-12° everywhere including at the pole itself.
    # tan(χ/2) by the branch that never cancels: sinχ/(1+cosχ) on the
    # pole hemisphere, (1−cosχ)/sinχ on the antipode hemisphere; then
    # sin/cos of χ_t reconstructed RATIONALLY from t' = tan(χ/2)/c (or
    # its reciprocal u, so u ∈ [0,1]) — no trig of near-π arguments.
    horiz = np.hypot(x2, y1)
    horiz_safe = np.where(horiz > 0.0, horiz, 1.0)
    north = z2 >= 0.0
    t = np.where(
        north,
        horiz / np.where(north, 1.0 + z2, 1.0),
        (1.0 - z2) / horiz_safe,
    )
    # exact antipode of the pole of stretching (horiz = 0, z = −1):
    # χ = π, a fixed point of the map
    t = np.where(~north & (horiz == 0.0), np.inf, t)
    t_new = t / c
    big = t_new > 1.0
    u = np.where(big, 1.0 / np.where(big, t_new, 1.0), t_new)
    den = 1.0 + u * u
    sin_t = 2.0 * u / den
    cos_t = np.where(big, -1.0, 1.0) * (1.0 - u * u) / den
    scale = np.where(horiz > 0.0, sin_t / horiz_safe, 0.0)
    x2, y1, z2 = x2 * scale, y1 * scale, cos_t
    # rotate back: Rz(λ_s) · Ry(−(90°−φ_s))
    x3 = x2 * math.cos(th) + z2 * math.sin(th)
    z3 = -x2 * math.sin(th) + z2 * math.cos(th)
    xr = x3 * math.cos(lam_s) - y1 * math.sin(lam_s)
    yr = x3 * math.sin(lam_s) + y1 * math.cos(lam_s)
    # arctan2(z, in-plane) rather than arcsin(z): near the geographic
    # poles z saturates at 1 (cos of a ~1e-8 rad colatitude rounds to
    # 1.0) while the in-plane components still carry the colatitude at
    # full relative precision
    lat = np.degrees(np.arctan2(z3, np.hypot(xr, yr)))
    lon = np.degrees(np.arctan2(yr, xr))
    lon = (lon + 180.0) % 360.0 - 180.0
    return lat, lon


def _spectral_degrees(t: int) -> np.ndarray:
    """Per-VALUE spherical-harmonic degree n of the triangular mode-1
    REAL sequence (re/im interleaved): for m = 0..T, n = m..T, two
    entries per complex coefficient — the array Laplacian scaling
    (template 5.51) applies along."""
    deg = np.concatenate([np.arange(m, t + 1) for m in range(t + 1)])
    return np.repeat(deg, 2)


def spectral_synthesis(coeffs, truncation: int, nj: int, ni: int):
    """Spherical-harmonic SYNTHESIS (the inverse Legendre + Fourier
    transform): mode-1 triangular coefficients → gridpoint values on
    the global regular Gaussian grid with ``nj`` parallels
    (:func:`gaussian_latitudes`) and ``ni`` equally spaced longitudes
    from 0°E — how a spectral archive (ERA5/IFS dynamics fields)
    becomes the lat/lon raster every downstream operator consumes.

    ``coeffs`` is the complex array a spectral record decodes to
    (:attr:`Grib2Record.spectral_coeffs`): C_n^m for m = 0..T,
    n = m..T in that order.  The field is real, so
    f(μ, λ) = Σ_n Re(C_n^0)·P̄_n^0(μ)
            + 2·Σ_{m=1}^{T} Σ_{n=m}^{T} P̄_n^m(μ)·
              [Re(C_n^m)·cos(mλ) − Im(C_n^m)·sin(mλ)]
    with the P̄ of :func:`spectral_legendre`.  Vectorized per zonal
    wavenumber: the Legendre sum contracts over degree for all
    latitudes at once, then the Fourier sum is two rank-1 outer
    products per m — O(T²·nj + T·nj·ni), no Python-per-cell work.

    Returns ``(values (nj, ni) north→south, latitudes_deg)``."""
    t = int(truncation)
    c = np.asarray(coeffs)
    npairs = (t + 1) * (t + 2) // 2
    if c.ndim != 1 or len(c) != npairs:
        raise ValueError(
            f"triangular T{t} spectrum has {npairs} coefficients, got "
            f"{c.shape}"
        )
    if ni < 1 or nj < 2:
        raise ValueError("synthesis grid needs nj >= 2 parallels, ni >= 1")
    # A REAL field has Im(C_n^0) ≡ 0.  The encoder validates that
    # exactly; a packed DECODE can carry ~quantization-sized residue
    # (Im encodes as (0−R)·2⁻ᴱ rounded), so the synthesis drops the
    # imaginary part — but a MEANINGFULLY nonzero Im(C_n^0) means a
    # mis-produced (or mis-parsed) file, and dropping it silently
    # would synthesize a subtly different field.  Warn loudly, scaled
    # against the spectrum magnitude so packing residue stays quiet.
    im0 = float(np.abs(c[: t + 1].imag).max(initial=0.0))
    ref = float(np.abs(c).max(initial=0.0))
    if im0 > 1e-6 * max(ref, np.finfo(np.float64).tiny):
        import warnings

        warnings.warn(
            f"spectral m=0 coefficients carry nonzero imaginary parts "
            f"(max |Im| {im0:.3e} vs spectrum max {ref:.3e}); a real "
            "field has Im(C_n^0) = 0 — synthesis uses the real parts "
            "only, so the producer file is suspect",
            RuntimeWarning,
            stacklevel=2,
        )
    lats = gaussian_latitudes(nj)
    mu = np.sin(np.radians(lats))
    p = spectral_legendre(t, mu)  # (m, n, nj)
    lon = np.radians(np.arange(ni) * 360.0 / ni)
    out = np.zeros((nj, ni))
    pos = 0
    for m in range(t + 1):
        cnt = t - m + 1
        cm = c[pos : pos + cnt]
        pos += cnt
        sm = (cm[:, None] * p[m, m : t + 1, :]).sum(axis=0)  # (nj,) complex
        if m == 0:
            # every C_n^0 of a real field is real (the decoder stores —
            # and the encoder validates — zero imaginary parts)
            out += sm.real[:, None]
        else:
            out += 2.0 * (
                np.outer(sm.real, np.cos(m * lon))
                - np.outer(sm.imag, np.sin(m * lon))
            )
    return out, lats


def _projected_increment(g: bytes, off: int) -> int:
    """Di/Dj of a projected grid template (millimetres).  Real-world
    producers often leave the increments-given resolution bits unset on
    projected grids even though Di/Dj are meaningful (HRRR ships flags
    0x08), so the guard is on the all-ones MISSING sentinel itself —
    decoding it as 4294967.295 m would scatter cells thousands of km
    apart silently."""
    (v,) = struct.unpack_from(">I", g, off)
    if v in (0, 0xFFFFFFFF):
        raise ValueError("projected-grid Di/Dj increment missing or zero")
    return v


# Shape-of-earth octet (code table 3.2) -> sphere radius in metres for
# the codes the codec emits/accepts.
_EARTH_RADIUS_M = {0: 6_367_470.0, 6: 6_371_229.0}


@dataclass
class Grib2Record:
    """One decoded GRIB2 message."""

    discipline: int
    category: int
    number: int
    reftime: tuple[int, int, int, int, int]  # (year, month, day, hour, minute)
    ni: int | None  # None on reduced Gaussian grids (per-row counts)
    nj: int
    lat_first_udeg: int
    lon_first_udeg: int
    dlat_udeg: int
    dlon_udeg: int
    decimal_scale: int
    binary_scale: int
    reference_value: float
    nbits: int
    values: np.ndarray  # (nj, ni) float64, NaN where the bitmap masks
    # Template 4.0 first fixed surface (None when coded missing 0xFF):
    level_type: int | None = None
    level_scale: int | None = None
    level_value: int | None = None
    # Second fixed surface (octets 29-34): the BOTTOM of a layer
    # product (soil layers, cloud layers, the max-wind layer); None —
    # the usual case — on point-level products.
    level2_type: int | None = None
    level2_scale: int | None = None
    level2_value: int | None = None
    packing_template: int = 0  # data representation template (5.N)
    # Template 4.8 (statistical processing over a time interval):
    # code-table-4.10 process (0 = average, 1 = accumulation, ...) and
    # the end of the overall interval; None for instantaneous (4.0).
    statistical_process: int | None = None
    interval_end: tuple[int, int, int, int, int] | None = None
    # Templates 4.1/4.11 (individual ensemble member): code-table-4.6
    # type, perturbation number, ensemble size; None on 4.0/4.8.
    # ensemble_size is shared with 4.2/4.12 (number of forecasts the
    # derived product was computed from).
    ensemble_type: int | None = None
    ensemble_member: int | None = None
    ensemble_size: int | None = None
    # Templates 4.2/4.12 (derived forecast from ALL ensemble members):
    # code-table-4.7 type (0 unweighted mean, 2 std dev, 4 spread, ...);
    # None on every other template.
    derived_forecast: int | None = None
    # Templates 4.5/4.9 (probability forecasts): probability index /
    # total, code-table-4.9 type (0 below lower, 1 above upper,
    # 2 between, 3 above lower, 4 below upper) and the decoded
    # threshold limits — None where the type doesn't bound that side.
    probability_number: int | None = None
    probability_total: int | None = None
    probability_type: int | None = None
    prob_lower_limit: float | None = None
    prob_upper_limit: float | None = None
    # Templates 4.3/4.4 (derived forecasts from a CLUSTER of ensemble
    # members — rectangular / circular cluster domains) and their
    # 4.13/4.14 statistical siblings: the cluster
    # identifier, total number of clusters, code-table-4.8 clustering
    # method, number of forecasts in THIS cluster, the member numbers
    # themselves, and the decoded in-cluster standard deviation and
    # distance from the ensemble mean.  derived_forecast /
    # ensemble_size (octets 35-36) are shared with the 4.2 family.
    # The control-cluster numbers (octets 38-39) and the domain
    # geometry (octets 42-57 rect / 42-53 circ) are length-validated
    # but not surfaced.  None on every other template.
    cluster_identifier: int | None = None
    cluster_total: int | None = None
    cluster_method: int | None = None
    cluster_size: int | None = None
    cluster_members: tuple[int, ...] | None = None
    cluster_stddev: float | None = None
    cluster_mean_distance: float | None = None
    # Templates 4.6/4.10 (percentile forecasts): the percentile
    # (0-100) this field represents; None on every other template.
    percentile_value: int | None = None
    # Template 4.15 (spatio-statistical processing — smoothed /
    # re-gridded products): the code-table-4.10 statistic applied over
    # the SPATIAL area, the code-table-4.15 processing type and the
    # number of points used; None on every other template.  Distinct
    # from statistical_process, which is a TIME-interval statistic.
    spatial_statistical_process: int | None = None
    spatial_process_type: int | None = None
    spatial_points: int | None = None
    # Templates 4.40-4.43 (atmospheric chemical constituents — the
    # CAMS chemistry family: 4.40 analysis/forecast, 4.41 ensemble
    # member, 4.42 statistical, 4.43 ensemble statistical): the
    # code-table-4.230 constituent type (ozone, NO2, PM2.5, ...).
    # Each template is its 4.0-family base with this one 2-octet field
    # inserted after the parameter number; None on every other
    # template (0xFFFF = coded missing also lands None).
    constituent_type: int | None = None
    # Templates 4.44-4.48 (aerosol family): the code-table-4.233
    # aerosol type, the code-table-4.91 size-interval type with its
    # decoded bounds in metres (value·10^-scale, either side None when
    # coded missing), and — template 4.48 only — the optical
    # wavelength interval likewise.  None on every other template.
    aerosol_type: int | None = None
    aerosol_size_interval: int | None = None
    aerosol_first_size_m: float | None = None
    aerosol_second_size_m: float | None = None
    aerosol_wavelength_interval: int | None = None
    aerosol_first_wavelength_m: float | None = None
    aerosol_second_wavelength_m: float | None = None
    # Templates 4.60/4.61 (individual ensemble REFORECAST — the GEFS
    # v12 reforecast archive form): the model-version date appended
    # after the ensemble octets, (year, month, day, hour, minute);
    # None on every other template.  A reforecast archive mixes runs
    # of several model versions over decades of reference times — the
    # column is what separates them.
    model_version: tuple[int, int, int, int, int] | None = None
    # Templates 4.31 (satellite product — observational imagery, the
    # non-deprecated successor of 4.30), 4.32 (simulated/synthetic
    # satellite imagery — the GOES-brightness-temperature products
    # NCEP publishes from GFS/NAM) and the ensemble-simulated forms
    # 4.33/4.34 (whose three 4.1-style ensemble octets follow the band
    # list, landing in the shared ensemble_* fields): number of
    # contributing spectral bands plus the per-band satellite series /
    # satellite number / instrument type and the central wave number
    # in m^-1 (decoded from each band's (scale factor, scaled value)
    # pair).  None on every other template.  These templates carry NO
    # fixed surfaces (a satellite view has no level — the level fields
    # stay None) and 4.31 carries no forecast-time octets either (the
    # field is an observation at the reference time — forecast_hours
    # is None).
    satellite_bands: int | None = None
    satellite_series: tuple[int, ...] | None = None
    satellite_numbers: tuple[int, ...] | None = None
    satellite_instruments: tuple[int, ...] | None = None
    central_wavenumbers: tuple[float | None, ...] | None = None
    # Template 4.20 (radar product): site-based metadata — the number
    # of radar sites used, the site's coordinates (degrees), elevation
    # (m), CCITT-IA5 and numeric identifiers and code-table-4.12
    # operating mode.  None on every non-radar product; radar products
    # have no fixed surfaces and no forecast-time octets (an
    # observation at the reference time), so the level columns and
    # forecast_hours stay None.
    radar_sites: int | None = None
    radar_site_id: str | None = None
    radar_site_number: int | None = None
    radar_site_lat: float | None = None
    radar_site_lon: float | None = None
    radar_elevation_m: int | None = None
    radar_operating_mode: int | None = None
    # Forecast lead time (octets 18-22, whole 4.0 family) converted to
    # WHOLE hours; 0 for analysis fields; None on templates 4.31
    # (observational satellite — no lead octets) and 4.20 (radar).
    forecast_hours: int | None = 0
    # 4.8-family statistical sections: number of time-range
    # specifications.  Only the FIRST (outermost) spec's process is
    # surfaced as statistical_process, so count > 1 marks a COMPOUND
    # statistic ("average of daily maxima") that would otherwise
    # masquerade as a plain one.
    time_range_count: int | None = None
    # Template 3.40 (Gaussian grid): N = parallels pole-to-equator and
    # the actual latitude of every row (north -> south); None for the
    # regular lat/lon template 3.0, where dlat_udeg applies instead.
    gaussian_n: int | None = None
    latitudes_deg: np.ndarray | None = None
    # REDUCED Gaussian grid (3.40 with Ni coded missing + the section-3
    # points-per-row list — ERA5's native archive layout): number of
    # points on each parallel, north -> south.  When set, ``ni`` is
    # None, ``values`` stays a FLAT (sum(row_ni),) array in storage
    # order (ragged rows can't reshape), and every row starts at
    # lon_first with spacing 360/row_ni[j].
    row_ni: np.ndarray | None = None
    # Templates 3.20 (polar stereographic) / 3.30 (Lambert conformal):
    # grid_template pins which grid family produced the record;
    # lambert_params (kind: "lcc" | "ps") carries the projection
    # (lad/lov/latin1/latin2/radius_m) plus the precomputed anchor
    # (x1, y1), mesh steps and the scan-derived y sign. Projected grids
    # have no affine lat/lon axes, so dlat/dlon_udeg are 0 and values
    # are NOT row-normalized.
    grid_template: int = 0
    lambert_params: dict | None = None
    # Which 4.x product definition template produced the record — the
    # field that makes template 4.7 (analysis/forecast ERROR, whose
    # octet layout is identical to 4.0's) distinguishable from the
    # analysis itself, and lets consumers select whole product
    # families (all statistical forms, all ensemble-derived forms)
    # the way wgrib2 prints the template number.
    product_template: int = 0
    # Template 3.50 (spherical harmonic coefficients): the triangular
    # truncation T (J = K = M).  ``values`` is then the FLAT real
    # sequence re/im interleaved in mode-1 order (m = 0..T, n = m..T),
    # ``nj`` the complex-coefficient count (T+1)(T+2)/2, ``ni`` None,
    # and every geographic field zero — spectral data HAS no grid
    # until an explicit :func:`spectral_synthesis` produces one.
    spectral_truncation: int | None = None
    # Template 5.51 only: the triangular sub-truncation TS of the
    # unpacked low-wavenumber subset (None on 5.50 / gridded records).
    spectral_sub_truncation: int | None = None

    @property
    def spectral_coeffs(self) -> np.ndarray | None:
        """Complex coefficients C_n^m in mode-1 order (m = 0..T,
        n = m..T) of a spectral record; None on gridded records."""
        if self.spectral_truncation is None:
            return None
        return self.values[0::2] + 1j * self.values[1::2]

    # Per-cell geographic coordinates (nj, ni) IN STORAGE ORDER —
    # computed lazily on first access (consumers like the landing
    # source reject projected grids before ever needing O(cells) trig).
    def _lambert_cells(self):
        cells = getattr(self, "_cells", None)
        if cells is None:
            lp = self.lambert_params
            if lp["kind"] in ("rotated", "stretched", "stretched_rotated"):
                # The affine fields hold the ROTATED and/or STRETCHED
                # axes (already row-normalized north-first in that
                # system's latitude); the Schmidt unstretch — the pole
                # of stretching is coded in the same system as the axes
                # — then (for the rotated forms) the unrotation yield
                # true coordinates per cell.
                rlats = (
                    self.lat_first_udeg
                    - self.dlat_udeg * np.arange(self.nj)[:, None]
                ) / 1e6
                rlons = (
                    self.lon_first_udeg
                    + self.dlon_udeg * np.arange(self.ni)[None, :]
                ) / 1e6
                shape = (self.nj, self.ni)
                lats = np.broadcast_to(rlats, shape)
                lons = np.broadcast_to(rlons, shape)
                if lp["kind"] in ("stretched", "stretched_rotated"):
                    lats, lons = schmidt_unstretch(
                        lats, lons, lp["st_lat"], lp["st_lon"], lp["st_c"]
                    )
                if lp["kind"] in ("rotated", "stretched_rotated"):
                    lats, lons = rotated_unrotate(
                        lats, lons, lp["sp_lat"], lp["sp_lon"], lp["angle"]
                    )
                self._cells = (lats, lons)
                return self._cells
            xs = lp["x1"] + lp["dx_m"] * np.arange(self.ni)[None, :]
            ys = lp["y1"] + lp["sj"] * lp["dy_m"] * np.arange(self.nj)[:, None]
            xg = np.broadcast_to(xs, (self.nj, self.ni))
            yg = np.broadcast_to(ys, (self.nj, self.ni))
            if lp["kind"] == "ps":
                cells = polar_stereo_inverse(
                    xg, yg, lp["lad"], lp["lov"], lp["radius_m"]
                )
            elif lp["kind"] == "mercator":
                cells = mercator_inverse(xg, yg, lp["lad"], lp["radius_m"])
            else:
                cells = lambert_inverse(
                    xg, yg, lp["lad"], lp["lov"], lp["latin1"],
                    lp["latin2"], lp["radius_m"],
                )
            self._cells = cells
        return cells

    def _reduced_cells(self):
        """Per-cell (lat, lon) of a reduced Gaussian grid, flat storage
        order: row j's latitude repeats row_ni[j] times; its longitudes
        are lon_first + i·360/row_ni[j] (full parallels, the only form
        the decoder admits)."""
        cells = getattr(self, "_cells", None)
        if cells is None:
            lon0 = self.lon_first_udeg / 1e6
            lats = np.repeat(self.latitudes_deg, self.row_ni)
            lons = np.concatenate(
                [(np.arange(n) * 360.0) / n + lon0 for n in self.row_ni]
            )
            cells = (lats, lons)
            self._cells = cells
        return cells

    @property
    def cell_lats_deg(self) -> np.ndarray | None:
        if self.lambert_params is not None:
            return self._lambert_cells()[0]
        if self.row_ni is not None:
            return self._reduced_cells()[0]
        return None

    @property
    def cell_lons_deg(self) -> np.ndarray | None:
        if self.lambert_params is not None:
            return self._lambert_cells()[1]
        if self.row_ni is not None:
            return self._reduced_cells()[1]
        return None


# --- complex packing (templates 5.2 / 5.3) --------------------------------
#
# Layout per WMO FM 92 GRIB2 and mirrored by NCEP's public g2clib
# (comunpack/compack): section 7 holds, in order, [5.3 only: the
# ``order`` initial scaled values then the overall minimum of the
# differences, each ``ww`` octets signed-magnitude], then NG group
# reference values (``nbits`` each, byte-aligned after the run), NG
# group-width increments (``wbits`` each, byte-aligned), NG scaled
# group lengths (``len_bits`` each, byte-aligned; the LAST group's
# length always comes from the template's true-length field), then
# every group's values packed CONTINUOUSLY at that group's width.
# Missing-value management 1 reserves the all-ones pattern at group
# width (and, for width-0 groups, the all-ones group reference) as the
# primary-missing marker.

_PRIMARY_MISSING_SUBSTITUTE = 9.999e20  # conventional float substitute


def _pack_varwidth(chunks) -> bytes:
    """Pack (uint64 array, width) runs into one continuous big-endian
    bit stream (no alignment between runs), zero-padded to a byte."""
    bit_arrays = []
    for vals, w in chunks:
        if w == 0 or len(vals) == 0:
            continue
        v = vals.astype(np.uint64)
        b = np.zeros(len(v) * w, dtype=np.uint8)
        for k in range(w):
            b[k::w] = (v >> np.uint64(w - 1 - k)) & np.uint64(1)
        bit_arrays.append(b)
    if not bit_arrays:
        return b""
    return np.packbits(np.concatenate(bit_arrays)).tobytes()


def _signed_magnitude(v: int, width: int) -> bytes:
    mag = abs(int(v))
    if mag >= 1 << (8 * width - 1):
        raise ValueError("signed-magnitude field overflow")
    b = bytearray(mag.to_bytes(width, "big"))
    if v < 0:
        b[0] |= 0x80
    return bytes(b)


def _build_complex_s57(
    x: np.ndarray,
    missing: np.ndarray | None,
    r_bytes: bytes,
    binary_scale: int,
    decimal_scale: int,
    group_len: int,
    spatial_order: int,
    secondary: np.ndarray | None = None,
    sub2_value: float | None = None,
) -> tuple[bytes, bytes]:
    """Build the (section 5 body, section 7 body) byte pair for complex
    packing. ``x`` is the full int64 increment array (one entry per
    packed point; entries at ``missing``/``secondary`` positions are
    ignored); ``spatial_order`` 0 → template 5.2, 1/2 → 5.3.
    ``secondary`` raises missing-value management to 2 (code table
    5.5): the top TWO codes of every group width become the primary /
    secondary markers, an all-secondary group codes as the
    all-ones-minus-1 group reference, and ``sub2_value`` rides as the
    section-5 secondary substitute the consumer lands at those
    points."""
    n = len(x)
    if group_len < 1:
        raise ValueError("group_len must be >= 1")
    x = x.astype(np.int64).copy()
    mvm = 2 if secondary is not None else (1 if missing is not None else 0)
    if mvm == 2 and missing is None:
        missing = np.zeros(n, dtype=bool)
    sec = secondary if mvm == 2 else None
    miss_any = (
        None if mvm == 0 else (missing if sec is None else (missing | sec))
    )
    reserve = 2 if mvm == 2 else (1 if mvm == 1 else 0)
    tmpl = 2 if spatial_order == 0 else 3
    extra = b""
    ww = 0
    if spatial_order:
        if spatial_order not in (1, 2):
            raise ValueError(
                f"unsupported spatial differencing order {spatial_order}"
            )
        # mvm composes with spatial differencing by differencing the
        # NON-MISSING subsequence only (the g2clib convention NCEP
        # precipitation products encode under): missing points pack as
        # group markers exactly as on 5.2, and the descriptors
        # describe the present subsequence.  The dense (no-mvm) case
        # is the SAME arithmetic with every point present.
        pres_idx = (
            np.arange(n) if miss_any is None else np.flatnonzero(~miss_any)
        )
        if len(pres_idx) < spatial_order:
            raise ValueError(
                "not enough present points for spatial differencing"
            )
        d = x[pres_idx].copy()
        ivals = [int(v) for v in d[:spatial_order]]
        if spatial_order == 1:
            d[1:] = np.diff(d)
        else:
            d[2:] = d[2:] - 2 * d[1:-1] + d[:-2] if len(d) > 2 else d[2:]
            d[1] = 0
        d[0] = 0
        gmin = int(d.min()) if len(d) else 0
        d -= gmin
        x[pres_idx] = d
        if miss_any is not None:
            # entries at missing positions never pack as values (the
            # group loop writes the marker codes); zero them so the
            # group references stay tight
            x[miss_any] = 0
        ww = 1
        while any(abs(v) >= 1 << (8 * ww - 1) for v in ivals + [gmin]):
            ww += 1
        extra = b"".join(_signed_magnitude(v, ww) for v in ivals + [gmin])

    starts = list(range(0, n, group_len))
    ng = len(starts)
    refs = np.zeros(ng, dtype=np.int64)
    widths = np.zeros(ng, dtype=np.int64)
    group_vals: list[tuple[np.ndarray, int]] = []
    all_missing = np.zeros(ng, dtype=bool)
    all_secondary = np.zeros(ng, dtype=bool)
    for gi, s0 in enumerate(starts):
        sl = slice(s0, min(s0 + group_len, n))
        gx = x[sl]
        gm = missing[sl] if mvm else None
        gs = sec[sl] if sec is not None else None
        gall = None
        if gm is not None:
            gall = gm if gs is None else (gm | gs)
        if gall is not None and gall.all():
            if gs is not None and gm.any() and gs.any():
                # MIXED all-missing group: no constant-reference
                # marker codes two kinds — use the width path with the
                # per-value markers; at w = 1 they are 1 (all-ones,
                # primary) and 0 (all-ones − 1, secondary), and no
                # value codes are needed
                w = 1
                vals = np.where(gm, (1 << w) - 1, (1 << w) - 2)
                refs[gi] = 0
                widths[gi] = w
                group_vals.append((vals.astype(np.uint64), w))
                continue
            all_missing[gi] = True
            all_secondary[gi] = gs is not None and bool(gs.all())
            group_vals.append((np.zeros(0, dtype=np.uint64), 0))
            continue
        pres = gx if gall is None else gx[~gall]
        ref = int(pres.min())
        maxd = int(pres.max()) - ref
        w = maxd.bit_length()
        if gall is not None and gall.any():
            # the top ``reserve`` codes at group width are the
            # primary / (mvm=2) secondary markers
            w = max(w, 1)
            while maxd >= (1 << w) - reserve:
                w += 1
            vals = np.where(gm, (1 << w) - 1, gx - ref)
            if gs is not None:
                vals = np.where(gs, (1 << w) - 2, vals)
        elif gall is not None:
            # mvm is on: the marker codes are reserved at group width
            # in EVERY group (decoders can't know which groups carry
            # missing) — bump the width when the max present delta
            # collides.
            while w and maxd >= (1 << w) - reserve:
                w += 1
            vals = gx - ref
        else:
            vals = gx - ref
        refs[gi] = ref
        widths[gi] = w
        group_vals.append((vals.astype(np.uint64), w))

    real_refs = refs[~all_missing]
    max_ref = int(real_refs.max()) if len(real_refs) else 0
    nbits_ref = max(max_ref.bit_length(), 1)
    if mvm:
        # the all-ones group REFERENCE is the all-primary-missing
        # marker for width-0 groups in EVERY message (mvm=2 also
        # reserves all-ones-minus-1 for all-secondary), whether or not
        # this one has such a group — an unreserved constant group
        # whose ref lands on a marker would decode as entirely missing.
        while max_ref >= (1 << nbits_ref) - reserve:
            nbits_ref += 1
        refs[all_missing & ~all_secondary] = (1 << nbits_ref) - 1
        refs[all_missing & all_secondary] = (1 << nbits_ref) - 2
    wref = int(widths.min()) if ng else 0
    wbits = int(int(widths.max()) - wref).bit_length() if ng else 0
    len_ref = group_len
    len_bits = 0  # every group is group_len; the last comes from true-length
    true_last = (n - starts[-1]) if ng else 0

    if mvm:
        sub1 = struct.pack(">f", _PRIMARY_MISSING_SUBSTITUTE)
    else:
        sub1 = b"\xff\xff\xff\xff"
    if mvm == 2 and sub2_value is not None:
        sub2 = struct.pack(">f", float(sub2_value))
    else:
        sub2 = b"\xff\xff\xff\xff"
    s5_body = (
        struct.pack(">I", n)
        + struct.pack(">H", tmpl)
        + r_bytes
        + _s16be(binary_scale)
        + _s16be(decimal_scale)
        + bytes([nbits_ref])
        + bytes([0])  # original field type: float
        + bytes([1])  # group splitting method: general
        + bytes([mvm])
        + sub1
        + sub2
        + struct.pack(">I", ng)
        + bytes([wref])
        + bytes([wbits])
        + struct.pack(">I", len_ref)
        + bytes([1])  # group length increment
        + struct.pack(">I", true_last)
        + bytes([len_bits])
    )
    if tmpl == 3:
        s5_body += bytes([spatial_order, ww])

    s7_body = (
        extra
        + _pack_varwidth([(refs.astype(np.uint64), nbits_ref)])
        + _pack_varwidth([((widths - wref).astype(np.uint64), wbits)])
        + _pack_varwidth([(np.zeros(ng, dtype=np.uint64), len_bits)])
        + _pack_varwidth(group_vals)
    )
    return s5_body, s7_body


def _rle_pack(levels: np.ndarray, nbits: int, mv: int) -> np.ndarray:
    """Template 7.200 run-length stream (the JMA radar-composite
    packing; convention per JMA Technical Information No. 215, the
    published decoding wgrib2 implements): the stream is ``nbits``-wide
    codes where a code ≤ MV is a LEVEL value (one occurrence) and a
    code > MV is a RUN-LENGTH DIGIT extending the preceding level's
    run — consecutive digits d₁..dₖ (stream order = least significant
    first) add Σ (dᵢ − MV − 1) · LNGU^(i−1) occurrences, with
    LNGU = 2^nbits − 1 − MV the digit base.  A run of n therefore
    encodes as the level once plus the base-LNGU digits of n − 1
    (no digits when n = 1)."""
    lngu = (1 << nbits) - 1 - mv
    out: list[int] = []
    i = 0
    n = len(levels)
    while i < n:
        lv = int(levels[i])
        run = 1
        while i + run < n and levels[i + run] == lv:
            run += 1
        if lngu < 2:
            # MV fills the code space to within one value: the lone
            # digit code (if any) carries base-1 positional weight 0,
            # so runs are unencodable — emit the level per occurrence
            # (decodes identically; base-1 "digits" would loop forever)
            out.extend([lv] * run)
            i += run
            continue
        out.append(lv)
        rem = run - 1
        while rem > 0:
            out.append(mv + 1 + rem % lngu)
            rem //= lngu
        i += run
    return np.asarray(out, dtype=np.int64)


def _rle_unpack(
    codes: np.ndarray, nbits: int, mv: int, total: int
) -> np.ndarray:
    """Inverse of :func:`_rle_pack` → ``total`` level values.  The
    byte-padding of section 7 can form up to ``floor(7/nbits)`` phantom
    all-zero codes past the last run — accepted ONLY as such (all zero,
    fewer than 8 bits); anything else past the grid is loud."""
    codes = np.asarray(codes, dtype=np.int64)
    lngu = (1 << nbits) - 1 - mv
    if codes.size == 0:
        if total:
            raise ValueError("empty run-length stream for a non-empty grid")
        return np.zeros(0, dtype=np.int64)
    is_level = codes <= mv
    if not is_level[0]:
        raise ValueError(
            "run-length stream opens with a run digit (no level to repeat)"
        )
    lp = np.flatnonzero(is_level)
    levels = codes[lp]
    bounds = np.append(lp, len(codes))
    runs = np.ones(len(lp), dtype=np.int64)
    didx = np.flatnonzero(~is_level)
    if didx.size:
        # vectorized digit accumulation: each digit belongs to the
        # nearest preceding level, its significance is its distance
        # past that level (LSB first) — no per-run Python loop (a
        # 1-km national composite carries ~10^6 codes)
        grp = np.searchsorted(lp, didx) - 1
        within = didx - lp[grp] - 1
        if lngu >= 2 and int(within.max()) * math.log2(lngu) > 62:
            # lngu^significance past 2^62 outruns any grid — a longer
            # digit chain is corrupt, and letting it through would
            # overflow the int64 base powers into garbage run lengths
            raise ValueError(
                "run-length digit chain exceeds any decodable run"
            )
        contrib = (codes[didx] - mv - 1) * lngu ** within
        np.add.at(runs, grp, contrib)
    cum = np.cumsum(runs)
    if cum[-1] < total:
        raise ValueError(
            f"run-length stream decodes {int(cum[-1])} cells, "
            f"grid has {total}"
        )
    k = int(np.searchsorted(cum, total))
    if cum[k] != total:
        raise ValueError("run-length run crosses the end of the grid")
    extra = codes[bounds[k + 1] :]
    if extra.size * nbits >= 8 or extra.any():
        raise ValueError(
            "trailing data past the grid in the run-length stream"
        )
    return np.repeat(levels[: k + 1], runs[: k + 1])


def _decode_complex_s7(
    s5: bytes, s7: bytes, tmpl5: int, n_points: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode a template 7.2/7.3 data section against its 5.2/5.3
    descriptor → (int64 increment array X, primary-missing bool mask,
    secondary-missing bool mask), each length ``n_points``.  Under
    missing-value management 2 the top TWO codes of every group width
    (and of the reference width, for constant groups) are the primary
    / secondary markers.  Spatial differencing (7.3) is integrated
    here; the caller applies Y = (R + X·2^E)/10^D.

    Native-codec swap-in point: like the JPEG2000 path (see
    grid/jpeg2000.py module docstring), this pure-Python group
    unpacker is the per-record CPU constant at 100 TB; it runs inside
    the landing source's ``mapInPandas`` stage, which is the
    replaceable unit.  A native GRIB library (eccodes/g2clib) drops in
    at this function's bytes→(X, missing) contract without touching
    the scan, the pushdown, or the record schema."""
    nbits_ref = s5[19]
    mvm = s5[22]
    if mvm not in (0, 1, 2):
        raise ValueError(f"unsupported missing value management {mvm}")
    (ng,) = struct.unpack_from(">I", s5, 31)
    wref = s5[35]
    wbits = s5[36]
    (len_ref,) = struct.unpack_from(">I", s5, 37)
    len_inc = s5[41]
    (true_last,) = struct.unpack_from(">I", s5, 42)
    len_bits = s5[46]
    order = ww = 0
    if tmpl5 == 3:
        order, ww = s5[47], s5[48]
        if order not in (1, 2):
            raise ValueError(f"unsupported spatial differencing order {order}")

    data = s7[5:]
    off = 0
    ivals: list[int] = []
    gmin = 0
    if tmpl5 == 3:
        if ww < 1:
            raise ValueError("missing extra-descriptor width (ww)")
        for _ in range(order + 1):
            raw = int.from_bytes(data[off : off + ww], "big")
            mag = raw & ((1 << (8 * ww - 1)) - 1)
            ivals.append(-mag if raw >> (8 * ww - 1) else mag)
            off += ww
        gmin = ivals.pop()

    allbits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
    bitpos = off * 8

    def take(count: int, width: int) -> np.ndarray:
        nonlocal bitpos
        if width > 63:
            # a uint64 weight shift of >= 64 wraps to zero (and bit 63
            # would wrap negative through the int64 view) — corrupt
            # width octets must stop loudly, not decode garbage
            raise ValueError(
                f"{width}-bit complex-packing field width is not decodable"
            )
        if width == 0 or count == 0:
            return np.zeros(count, dtype=np.int64)
        end = bitpos + count * width
        if end > len(allbits):
            raise ValueError("truncated complex-packing data section")
        seg = allbits[bitpos:end].reshape(count, width).astype(np.uint64)
        bitpos = end
        w = np.uint64(1) << np.arange(width - 1, -1, -1, dtype=np.uint64)
        return (seg @ w).astype(np.int64)

    def align() -> None:
        nonlocal bitpos
        bitpos = (bitpos + 7) // 8 * 8

    refs = take(ng, nbits_ref)
    align()
    widths = wref + take(ng, wbits)
    align()
    lengths = len_ref + len_inc * take(ng, len_bits)
    align()
    if ng:
        lengths[-1] = true_last
    if int(lengths.sum()) != n_points:
        raise ValueError(
            f"group lengths sum to {int(lengths.sum())}, expected {n_points}"
        )

    x = np.zeros(n_points, dtype=np.int64)
    miss = np.zeros(n_points, dtype=bool)
    miss2 = np.zeros(n_points, dtype=bool)
    ref_marker = (1 << nbits_ref) - 1
    pos = 0
    for gi in range(ng):
        length, w, ref = int(lengths[gi]), int(widths[gi]), int(refs[gi])
        if w == 0:
            if mvm and ref == ref_marker:
                miss[pos : pos + length] = True
            elif mvm == 2 and ref == ref_marker - 1:
                miss2[pos : pos + length] = True
            else:
                x[pos : pos + length] = ref
        else:
            vals = take(length, w)
            if mvm:
                mm = vals == (1 << w) - 1
                mm2 = (
                    vals == (1 << w) - 2
                    if mvm == 2
                    else np.zeros(length, dtype=bool)
                )
                miss[pos : pos + length] = mm
                miss2[pos : pos + length] = mm2
                vals = np.where(mm | mm2, 0, ref + vals)
                x[pos : pos + length] = vals
            else:
                x[pos : pos + length] = ref + vals
        pos += length

    if tmpl5 == 3:
        # With missing-value management the differencing ran over the
        # NON-MISSING subsequence only (g2clib's comunpack
        # convention): reconstruct on that subsequence — second
        # differences → first differences → values — and scatter back;
        # missing points stay missing.  The dense (mvm = 0) case is
        # the SAME arithmetic with every point present.
        pres_idx = (
            np.arange(n_points)
            if not mvm
            else np.flatnonzero(~(miss | miss2))
        )
        d = x[pres_idx] + gmin  # entries below ``order`` overwritten next
        m = len(pres_idx)
        sub = np.empty(m, dtype=np.int64)
        if order == 1:
            if m > 0:
                sub[0] = ivals[0]
            if m > 1:
                sub[1:] = ivals[0] + np.cumsum(d[1:])
        else:
            if m > 0:
                sub[0] = ivals[0]
            if m > 1:
                sub[1] = ivals[1]
            if m > 2:
                g1 = (ivals[1] - ivals[0]) + np.cumsum(d[2:])
                sub[2:] = ivals[1] + np.cumsum(g1)
        x = np.zeros(n_points, dtype=np.int64)
        x[pres_idx] = sub
    return x, miss, miss2


def _surface_type_octet(value) -> int:
    """Fixed-surface TYPE octet at encode: 0-255 with 255 meaning
    'surface coded missing' (legal to request explicitly) — but out of
    range stops loudly instead of '& 0xFF' masking to a different
    surface type."""
    v = int(value)
    if not 0 <= v <= 255:
        raise ValueError(f"fixed surface type {v} out of range 0-255")
    return v


def _pdt_octet(value, what: str) -> int:
    """Validate a 1-octet product-definition field at ENCODE: the wire
    holds 0-255 with 255 reserved as the coded-missing sentinel, so an
    out-of-range value (e.g. ensemble member 256) must stop loudly —
    ``& 0xFF`` masking would silently encode it as a DIFFERENT member."""
    v = int(value)
    if not 0 <= v <= 254:
        raise ValueError(
            f"{what} {v} out of range 0-254 (255 is the missing sentinel)"
        )
    return v


def _scaled_pair(limit) -> bytes:
    """Template 4.5 threshold pair at ENCODE: (scale factor, scaled
    value) → 1 + 4 octets, both signed-magnitude; ``None`` → coded
    missing (the probability type doesn't bound that side).  A -127
    scale would collide with the 0xFF missing sentinel, so the legal
    signed-magnitude range is -126..127."""
    if limit is None:
        return b"\xff" + b"\xff\xff\xff\xff"
    scale, value = int(limit[0]), int(limit[1])
    if not -126 <= scale <= 127:
        raise ValueError(
            f"threshold scale factor {scale} out of signed-magnitude range"
        )
    if value == -(2**31 - 1):
        # sign-magnitude -(2^31-1) is the all-ones word — it would
        # round-trip as coded-missing (no limit), silently losing the
        # threshold; same collision class as scale -127
        raise ValueError(
            "threshold scaled value collides with the coded-missing sentinel"
        )
    return bytes([(0x80 | -scale) if scale < 0 else scale]) + _s32be(value)


def encode_grib2_message(
    values: np.ndarray,
    *,
    discipline: int = 0,  # meteorological
    category: int = 0,  # temperature
    number: int = 0,  # TMP
    reftime: tuple[int, int, int, int, int] = (2020, 1, 1, 0, 0),
    lat_first_udeg: int = 90_000_000,
    lon_first_udeg: int = 0,
    dlat_udeg: int = 1_000_000,
    dlon_udeg: int = 1_000_000,
    decimal_scale: int = 0,
    binary_scale: int = 0,
    nbits: int = 16,
    bitmap: np.ndarray | None = None,
    reference_value: float | None = None,
    scanning_mode: int = 0x00,
    level_type: int = 1,  # ground surface
    level_scale: int = 0,
    level_value: int = 0,
    level2: dict | None = None,
    packing: str = "simple",
    group_len: int = 20,
    spatial_diff_order: int = 2,
    missing_mask: np.ndarray | None = None,
    secondary_mask: np.ndarray | None = None,
    secondary_substitute: float | None = None,
    log_offset: float | None = None,
    aec_block_size: int = 32,
    aec_rsi: int = 128,
    rle_table=None,
    gaussian: bool = False,
    reduced_ni=None,
    lambert: dict | None = None,
    polar_stereo: dict | None = None,
    mercator: dict | None = None,
    rotated: dict | None = None,
    stretched: dict | None = None,
    spectral: dict | None = None,
    statistical: dict | None = None,
    ensemble: dict | None = None,
    derived: dict | None = None,
    probability: dict | None = None,
    percentile: int | None = None,
    spatial: dict | None = None,
    cluster: dict | None = None,
    error: bool = False,
    forecast: dict | None = None,
    satellite: dict | None = None,
    radar: dict | None = None,
    chemistry: int | None = None,
    aerosol: dict | None = None,
    model_version: tuple | None = None,
) -> bytes:
    """Encode a (nj, ni) grid as one GRIB2 message.

    ``values`` row 0 is ALWAYS the northernmost row regardless of
    ``scanning_mode`` (0x40 stores rows south-first — see grib1).
    ``level_type``/``level_scale``/``level_value`` populate template
    4.0's first fixed surface (type, scale factor, scaled value);
    ``level2`` (keys ``type``, ``value``, optional ``scale``) populates
    the SECOND fixed surface (octets 29-34) making the field a LAYER
    product — omitted, the second surface is coded missing (a point
    level).

    ``packing`` selects the data-representation template: ``"simple"``
    (5.0), ``"complex"`` (5.2, general group splitting in fixed
    ``group_len`` runs), ``"complex_diff"`` (5.3 with
    ``spatial_diff_order`` 1 or 2), ``"png"`` (5.41: the scaled
    integer field as one PNG image — grayscale 8/16-bit, RGB for 24,
    RGBA for 32, big-endian pixels, the g2clib/wgrib2 convention), or
    ``"jpeg2000"`` (5.40: the scaled integer field as one lossless raw
    JPEG2000 codestream, grid/jpeg2000.py — the packing most NCEP
    GRIB2 products, e.g. GFS, actually ship).
    ``missing_mask`` (bool, True = missing; complex only) encodes
    missing points via missing-value management 1 — in-data
    substitution instead of a section-6 bitmap.  ``secondary_mask``
    raises it to management 2 (code table 5.5 — NEXRAD-style products
    distinguishing "missing" from e.g. "below detection threshold"):
    secondary points code as the second-from-top marker at each group
    width, and ``secondary_substitute`` rides in section 5 octets
    28-31 as the value the consumer lands at those points (omitted →
    coded missing → the decoder falls back to NaN).  The two masks
    must not overlap.

    ``reduced_ni`` encodes a REDUCED Gaussian grid (ERA5's native
    layout): pass the points-per-parallel list (north -> south, even
    count = 2N) and ``values`` as the flat ragged concatenation of
    rows; Ni/Di are coded missing and the list rides in section 3's
    optional-numbers block.

    ``spectral`` (key ``truncation``) encodes SPHERICAL-HARMONIC
    coefficients instead of gridpoints — grid definition template 3.50
    (triangular truncation J = K = M = T, associated Legendre type 1,
    complex-packing mode 1) with data representation template 5.50
    (spectral data simple packing: the real part of the (0,0)
    coefficient rides UNPACKED as an IEEE-32 float in the template,
    every other value simple-packed in section 7).  ``values`` is the
    1-D COMPLEX array C_n^m for m = 0..T, n = m..T in that order
    ((T+1)(T+2)/2 coefficients); the field is real, so every m = 0
    coefficient must have zero imaginary part (validated — a synthesis
    would silently drop it).  Spectral data has no grid, bitmap or
    raster packing: only ``packing="simple"`` composes."""
    spec_t: int | None = None
    spec_sub: int | None = None
    spec_p = 0.0
    spec_unpacked: np.ndarray | None = None
    if spectral is not None:
        spec_t = int(spectral["truncation"])
        if spec_t < 1:
            raise ValueError("spectral truncation must be >= 1")
        if packing != "simple":
            raise ValueError(
                "spectral data packs with template 5.50/5.51 (simple) only"
            )
        if bitmap is not None or missing_mask is not None:
            raise ValueError("spectral data carries no bitmap/missing mask")
        if scanning_mode != 0x00:
            raise ValueError("spectral data has no scanning mode")
        c = np.asarray(values)
        npairs = (spec_t + 1) * (spec_t + 2) // 2
        if c.ndim != 1 or len(c) != npairs or not np.iscomplexobj(c):
            raise ValueError(
                f"triangular T{spec_t} spectrum is a 1-D complex array of "
                f"{npairs} coefficients (m = 0..T, n = m..T)"
            )
        if len(c) and float(np.abs(c[: spec_t + 1].imag).max()) != 0.0:
            raise ValueError(
                "m = 0 coefficients of a real field have zero imaginary part"
            )
        vals = np.empty(2 * npairs, dtype=np.float64)
        vals[0::2] = c.real
        vals[1::2] = c.imag
        if "sub_truncation" in spectral:
            # Template 5.51 (COMPLEX spectral packing — the form
            # operational IFS/ERA5 spectral archives actually use):
            # the low-wavenumber sub-spectrum (n <= TS, triangular)
            # rides UNPACKED as IEEE-32 floats at the head of section
            # 7, and every remaining value is multiplied by the
            # Laplacian weight (n(n+1))^p BEFORE simple packing — the
            # weight flattens the n^-k decay of spectral amplitudes so
            # fixed-width increments lose far less precision.  The
            # sub-spectrum must contain n = 0 (the weight is zero
            # there) — guaranteed by 0 <= TS < T.
            spec_sub = int(spectral["sub_truncation"])
            spec_p = float(spectral.get("laplacian", 1.0))
            if not 0 <= spec_sub < spec_t:
                raise ValueError(
                    f"sub-truncation {spec_sub} must satisfy "
                    f"0 <= TS < T={spec_t}"
                )
            if not -128.0 <= spec_p <= 128.0:
                raise ValueError(
                    f"Laplacian scaling exponent {spec_p} out of range"
                )
            deg2 = _spectral_degrees(spec_t)
            sub = deg2 <= spec_sub
            spec_unpacked = vals[sub]
            dn = deg2[~sub].astype(np.float64)
            vals = np.concatenate(
                (spec_unpacked, vals[~sub] * (dn * (dn + 1.0)) ** spec_p)
            )
    else:
        vals = np.asarray(values, dtype=np.float64)
    reduced_arr: np.ndarray | None = None
    if reduced_ni is not None:
        # Reduced Gaussian grid: ``values`` is the FLAT ragged
        # concatenation of rows (north -> south), ``reduced_ni`` the
        # points-per-parallel list encoded into section 3's optional
        # list with Ni/Di coded missing.
        reduced_arr = np.asarray(reduced_ni, dtype=np.int64)
        if vals.ndim != 1 or len(vals) != int(reduced_arr.sum()):
            raise ValueError(
                "reduced-grid values must be flat with sum(reduced_ni) points"
            )
        if len(reduced_arr) % 2 or len(reduced_arr) < 2 or (reduced_arr <= 0).any():
            raise ValueError(
                "a global reduced Gaussian grid has an even positive parallel count"
            )
        if (reduced_arr > 0xFFFF).any():
            raise ValueError("points-per-row exceeds the 2-octet list width")
        if scanning_mode != 0x00:
            raise ValueError("Gaussian grids are encoded north-first only")
        if bitmap is not None and (
            np.asarray(bitmap).ndim != 1
            or len(np.asarray(bitmap)) != len(vals)
        ):
            # the reduced layout is the FLAT ragged concatenation, so
            # its bitmap is the same flat mask — section 6 carries
            # sum(reduced_ni) bits in storage order (the decode side
            # composed these generically all along; the encoder
            # refusal was the r15 cross-edition asymmetry)
            raise ValueError(
                "a reduced-grid bitmap must be flat with "
                "sum(reduced_ni) points"
            )
        if missing_mask is not None:
            raise ValueError(
                "missing_mask not supported on reduced grids "
                "(use a bitmap)"
            )
        if packing in ("png", "jpeg2000"):
            raise ValueError(
                "raster packings need a rectangular grid; use simple/complex"
            )
    elif spec_t is None and vals.ndim != 2:
        raise ValueError("values must be (nj, ni)")
    if scanning_mode not in (0x00, 0x40):
        raise ValueError(f"unsupported scanning mode 0x{scanning_mode:02x}")
    if gaussian and scanning_mode != 0x00:
        raise ValueError("Gaussian grids are encoded north-first only")
    latlon_mod = rotated if rotated is not None else stretched
    if sum(
        x is not None
        for x in (
            gaussian or None, reduced_arr, lambert, polar_stereo, mercator,
            latlon_mod, spec_t,
        )
    ) > 1:
        raise ValueError("choose exactly one grid family")
    if rotated is not None and not -90.0 <= float(
        rotated["south_pole_lat"]
    ) <= 90.0:
        raise ValueError("rotated-grid southern pole latitude out of range")
    if stretched is not None:
        if not -90.0 <= float(stretched["pole_lat"]) <= 90.0:
            raise ValueError("pole-of-stretching latitude out of range")
        if not 0.0 < float(stretched["factor"]) < 4000.0:
            raise ValueError(
                f"stretching factor {stretched['factor']} out of range"
            )
    if lambert is not None:
        _lambert_setup(
            lambert["lad"], lambert["latin1"], lambert["latin2"],
            _EARTH_RADIUS_M[6],
        )  # validates the cone (loud southern-cone reject) at encode
    if polar_stereo is not None and polar_stereo["lad"] <= -90.0:
        raise ValueError("degenerate polar-stereographic true-scale latitude")
    if mercator is not None and not -90.0 < mercator["lad"] < 90.0:
        raise ValueError("degenerate Mercator true-scale latitude")
    if packing not in (
        "simple", "complex", "complex_diff", "png", "jpeg2000",
        "ieee32", "ieee64", "log", "aec", "runlength",
    ):
        raise ValueError(f"unknown packing {packing!r}")
    if (rle_table is not None) != (packing == "runlength"):
        raise ValueError(
            "packing='runlength' and rle_table go together (the level "
            "table IS the quantization)"
        )
    if spec_t is not None:
        nj, ni = len(vals) // 2, None  # complex coefficient count; no grid
    elif reduced_arr is not None:
        nj, ni = len(reduced_arr), None  # ragged rows: no common Ni
    else:
        nj, ni = vals.shape
    bm = None if bitmap is None else np.asarray(bitmap, dtype=bool)
    if bm is not None and bm.shape != vals.shape:
        raise ValueError("bitmap shape must match values")
    mm = None if missing_mask is None else np.asarray(missing_mask, dtype=bool)
    sm = (
        None if secondary_mask is None
        else np.asarray(secondary_mask, dtype=bool)
    )
    if mm is not None or sm is not None:
        if packing not in ("complex", "complex_diff"):
            raise ValueError(
                "missing_mask/secondary_mask (missing-value management) "
                "requires packing='complex' or 'complex_diff'"
            )
        if bm is not None:
            raise ValueError(
                "missing/secondary masks and bitmap are mutually exclusive"
            )
        for m, what in ((mm, "missing_mask"), (sm, "secondary_mask")):
            if m is not None and m.shape != vals.shape:
                raise ValueError(f"{what} shape must match values")
        if mm is not None and sm is not None and (mm & sm).any():
            raise ValueError(
                "a point cannot be both primary- and secondary-missing"
            )
    if sm is None and secondary_substitute is not None:
        raise ValueError("secondary_substitute requires secondary_mask")
    if log_offset is not None and packing != "log":
        raise ValueError("log_offset requires packing='log'")
    if (
        scanning_mode == 0x40
        and lambert is None
        and polar_stereo is None
        and mercator is None
    ):
        # lat/lon grids: caller row 0 is ALWAYS northernmost; 0x40
        # stores rows south-first on the wire.  Projected grids have no
        # latitude axis — values are stored exactly as given and the
        # scan bit only orients the per-cell y coordinates.
        vals = vals[::-1]
        bm = None if bm is None else bm[::-1]
        mm = None if mm is None else mm[::-1]
        sm = None if sm is None else sm[::-1]
    present = vals.reshape(-1)
    if spec_sub is not None:
        # Template 5.51: the scaled values past the unpacked
        # sub-spectrum simple-pack; the sub-spectrum rides in section 7
        # ahead of the bitstream.
        present = present[len(spec_unpacked):]
    elif spec_t is not None:
        # Template 5.50: the (0,0) real coefficient rides unpacked in
        # the template (IEEE-32); everything else simple-packs.
        present = present[1:]
    if bm is not None:
        present = present[bm.reshape(-1)]
    mm_flat = None if mm is None else mm.reshape(-1)
    sm_flat = None if sm is None else sm.reshape(-1)
    exclude = None
    if mm_flat is not None or sm_flat is not None:
        exclude = np.zeros(len(present), dtype=bool)
        if mm_flat is not None:
            exclude |= mm_flat
        if sm_flat is not None:
            exclude |= sm_flat
        present = present[~exclude]
    if packing in ("ieee32", "ieee64"):
        # Template 5.4 (IEEE floating-point data): values ride RAW —
        # no reference value, scales or quantization; octet 12 is the
        # precision (code table 5.7: 1 = binary32, 2 = binary64).
        # NaN present cells are as illegal as everywhere else (missing
        # needs a bitmap), and float32 precision loss is the caller's
        # explicit choice of packing, not a silent quantization.
        if np.isnan(present).any():
            raise ValueError(
                "NaN cells need a bitmap (template 5.4 packs raw floats)"
            )
        if spec_t is not None:
            raise ValueError(
                "spectral data packs with template 5.50/5.51 (simple) only"
            )
        prec = 1 if packing == "ieee32" else 2
        s5_body = (
            struct.pack(">I", len(present))
            + struct.pack(">H", 4)  # data representation template 5.4
            + bytes([prec])
        )
        s7_body = np.ascontiguousarray(
            present, dtype=">f4" if prec == 1 else ">f8"
        ).tobytes()
        r_bytes = b""  # unused below; 5.4 has no reference value
    elif packing == "runlength":
        # Template 5.200 (run length with level values — the JMA
        # radar-composite packing): there is NO R/E/D quantization;
        # ``rle_table`` holds the MVL scaled representative values
        # (2-octet unsigned, physical = value / 10^decimal_scale),
        # every present cell must BE a table value exactly, NaN is
        # level 0, and MV is the highest level this field uses (the
        # remaining code space 2^nbits − 1 − MV is the run-digit
        # base).  Composes with the 4.20 radar products the way JMA
        # composites ship.
        if spec_t is not None:
            raise ValueError(
                "spectral data packs with template 5.50/5.51 (simple) only"
            )
        if bm is not None or mm is not None:
            raise ValueError(
                "run-length packing carries missing cells as level 0 "
                "(no bitmap / missing-value management)"
            )
        if not 2 <= nbits <= 16:
            raise ValueError(
                f"run-length packing needs 2-16 bits per code, got {nbits}"
            )
        if not -126 <= decimal_scale <= 126:
            raise ValueError(
                f"decimal scale {decimal_scale} out of the one-octet "
                "signed-magnitude range"
            )
        tbl = [int(t) for t in rle_table]
        mvl = len(tbl)
        if not 1 <= mvl <= (1 << nbits) - 2:
            raise ValueError(
                f"level table size {mvl} out of range 1-{(1 << nbits) - 2} "
                f"for {nbits}-bit codes (one code is level 0, at least "
                "one must remain for run digits)"
            )
        if any(not 0 <= t <= 0xFFFF for t in tbl):
            raise ValueError("level-table entries are 2-octet unsigned")
        if len(set(tbl)) != mvl:
            raise ValueError("level-table entries must be distinct")
        lookup = {t: k + 1 for k, t in enumerate(tbl)}
        levels = np.zeros(len(present), dtype=np.int64)
        pres_mask = ~np.isnan(present)
        scaled = np.round(
            present[pres_mask] * (10.0 ** decimal_scale)
        )
        exact = np.abs(
            present[pres_mask] * (10.0 ** decimal_scale) - scaled
        )
        if exact.size and float(exact.max()) > 1e-6:
            raise ValueError(
                "run-length packing is a LEVEL code: every present cell "
                "must equal a table value exactly at the declared "
                "decimal scale"
            )
        try:
            levels[pres_mask] = [lookup[int(s)] for s in scaled]
        except KeyError as exc:
            raise ValueError(
                f"cell value {int(exc.args[0])}/10^{decimal_scale} is "
                "not in the level table"
            ) from None
        mv = int(levels.max())
        codes = _rle_pack(levels, nbits, mv)
        s5_body = (
            struct.pack(">I", len(present))
            + struct.pack(">H", 200)  # data representation template
            + bytes([nbits])
            + struct.pack(">H", mv)
            + struct.pack(">H", mvl)
            + bytes(
                [(0x80 | -decimal_scale) if decimal_scale < 0
                 else decimal_scale]
            )
            + b"".join(struct.pack(">H", t) for t in tbl)
        )
        s7_body = _pack_bits(codes, nbits)
        r_bytes = b""  # unused below; 5.200 has no reference value
    else:
        if packing == "log":
            # Template 5.61 (simple packing with LOGARITHM
            # pre-processing): Z = ln(Y + B) is what quantizes —
            # flattening a dynamic range spanning decades (ECMWF
            # precipitation-style products) into fixed-width
            # increments.  Every present cell must satisfy Y + B > 0
            # or the transform is undefined.
            if spec_t is not None:
                raise ValueError(
                    "spectral data packs with template 5.50/5.51 "
                    "(simple) only"
                )
            # transform with the float32-ROUNDED B the wire carries
            # (section 5 stores IEEE-32) — like the reference value,
            # which quantizes against its f32-decoded form; a full-
            # precision transform would leave a constant |B - f32(B)|
            # bias no nbits increase could remove
            log_b = 0.0 if log_offset is None else float(
                np.float32(log_offset)
            )
            if np.isnan(present).any():
                raise ValueError(
                    "NaN cells need a bitmap (log packing transforms "
                    "every present cell)"
                )
            if (present + log_b <= 0.0).any():
                raise ValueError(
                    "log packing needs Y + B > 0 for every present "
                    f"cell (B = {log_b})"
                )
            present = np.log(present + log_b)
        # Complex packing computes per-group widths — the caller's
        # nbits only constrains the SIMPLE/log/AEC templates; pass the
        # quantizer a 64-bit ceiling otherwise.  Routing AEC through
        # the width check matters: nbits=0 with non-constant data must
        # stop here (the empty-stream constant-field convention would
        # otherwise silently flatten the field).
        q_nbits = nbits if packing in ("simple", "log", "aec") else 64
        r_bytes, r, x = quantize_simple_packing(
            present,
            decimal_scale,
            binary_scale,
            q_nbits,
            reference_value,
            _f32_encode,
            _f32_encode_floor,
            _f32_decode,
        )
    if packing in ("ieee32", "ieee64", "runlength"):
        pass  # s5/s7 bodies already built above
    elif packing == "log":
        # 5.61 keeps 5.0's R/E/D/width head; octets 21-24 carry B
        # (IEEE-32) in place of 5.0's original-field-type octet.
        s5_body = (
            struct.pack(">I", len(present))
            + struct.pack(">H", 61)  # data representation template 5.61
            + r_bytes
            + _s16be(binary_scale)
            + _s16be(decimal_scale)
            + bytes([nbits])
            + struct.pack(">f", log_b)
        )
        s7_body = _pack_bits(x, nbits)
    elif packing == "aec":
        # Template 5.42: the scaled increments X CCSDS-encode with the
        # GRIB-conventional parameters (MSB, preprocessor on) — the
        # nbits=0 constant field keeps the empty-stream convention.
        from .aec import FLAG_MSB, FLAG_PREPROCESS, aec_encode

        aec_flags = FLAG_MSB | FLAG_PREPROCESS
        s5_body = (
            struct.pack(">I", len(present))
            + struct.pack(">H", 42)  # data representation template 5.42
            + r_bytes
            + _s16be(binary_scale)
            + _s16be(decimal_scale)
            + bytes([nbits])
            + bytes([aec_flags])
            + bytes([aec_block_size])
            + struct.pack(">H", aec_rsi)
        )
        s7_body = (
            b""
            if nbits == 0
            else aec_encode(
                x, nbits,
                flags=aec_flags, block_size=aec_block_size, rsi=aec_rsi,
            )
        )
    elif packing == "simple":
        if spec_sub is not None:
            # Template 5.51: Laplacian exponent ×10^6 (signed-
            # magnitude), the JS/KS/MS sub-truncation and the
            # precision of the unpacked subset (code table 5.7:
            # 1 = IEEE 32-bit); section 7 leads with the unpacked
            # sub-spectrum floats, then the packed bitstream.
            tail = (
                _s32be(int(round(spec_p * 1e6)))
                + struct.pack(">HHH", spec_sub, spec_sub, spec_sub)
                + bytes([1])
            )
            tmpl5_no = 51
        elif spec_t is not None:
            # 5.50 tails with the unpacked (0,0) real coefficient
            # instead of 5.0's original-field-type octet
            tail = _f32_encode(float(vals[0]))
            tmpl5_no = 50
        else:
            tail = bytes([0])  # original field type: float
            tmpl5_no = 0
        s5_body = (
            struct.pack(">I", len(present))
            + struct.pack(">H", tmpl5_no)
            + r_bytes
            + _s16be(binary_scale)
            + _s16be(decimal_scale)
            + bytes([nbits])
            + tail
        )
        s7_body = _pack_bits(x, nbits)
        if spec_sub is not None:
            s7_body = (
                b"".join(_f32_encode(float(v)) for v in spec_unpacked)
                + s7_body
            )
    elif packing == "jpeg2000":
        from .jpeg2000 import j2k_encode

        # An all-masked field has no raster to encode: nbits=0 + empty
        # section 7 (the constant-field convention), decoded by the
        # nbits==0 branch — never a zero-size image crash.
        need = (
            0
            if len(present) == 0
            else max(int(x.max()).bit_length(), 1)
        )
        if need > 29:
            raise ValueError(
                f"increment range needs {need} bits — JPEG2000 packing caps at 29"
            )
        # g2clib's jpcpack layout mirrors pngpack: the full grid is the
        # image; with a bitmap the present values ride as one scanline.
        shape = (1, len(present)) if bm is not None else (nj, ni)
        s5_body = (
            struct.pack(">I", len(present))
            + struct.pack(">H", 40)  # data representation template 5.40
            + r_bytes
            + _s16be(binary_scale)
            + _s16be(decimal_scale)
            + bytes([need])
            + bytes([0])  # original field type: float
            + bytes([0])  # compression type: lossless
            + bytes([255])  # target compression ratio: n/a (lossless)
        )
        s7_body = (
            b"" if need == 0 else j2k_encode(x.reshape(shape).astype(np.int64), need)
        )
    elif packing == "png":
        from .png import png_encode

        need = int(x.max()).bit_length() if len(x) else 1
        if need > 32:
            raise ValueError(
                f"increment range needs {need} bits — PNG packing caps at 32"
            )
        # An all-masked field has no raster: nbits=0 + empty section 7
        # (constant-field convention), mirroring the JPEG2000 branch.
        sample_bits = (
            0
            if len(present) == 0
            else next(b for b in (8, 16, 24, 32) if b >= max(need, 1))
        )
        # g2clib's pngpack layout: the full grid is the image; with a
        # bitmap, the present values pack as one ndpts×1 scanline.
        shape = (1, len(present)) if bm is not None else (nj, ni)
        s5_body = (
            struct.pack(">I", len(present))
            + struct.pack(">H", 41)  # data representation template 5.41
            + r_bytes
            + _s16be(binary_scale)
            + _s16be(decimal_scale)
            + bytes([sample_bits])
            + bytes([0])  # original field type: float
        )
        s7_body = (
            b"" if sample_bits == 0 else png_encode(x.reshape(shape), sample_bits)
        )
    else:
        if exclude is not None:
            x_full = np.zeros(len(exclude), dtype=np.int64)
            x_full[~exclude] = x.astype(np.int64)
        else:
            x_full = x.astype(np.int64)
        order = 0 if packing == "complex" else spatial_diff_order
        s5_body, s7_body = _build_complex_s57(
            x_full, mm_flat, r_bytes, binary_scale, decimal_scale,
            group_len, order,
            secondary=sm_flat, sub2_value=secondary_substitute,
        )

    def section(number_: int, body: bytes) -> bytes:
        return struct.pack(">IB", 4 + 1 + len(body), number_) + body

    s1 = section(
        1,
        struct.pack(">HHBBB", 74, 0, 2, 1, 1)  # centre, subcentre, tables, local, sig
        + struct.pack(">HBBBBB", reftime[0], reftime[1], reftime[2], reftime[3], reftime[4], 0)
        + bytes([0, 1]),  # production status, data type
    )
    earth = (
        bytes([6, 0xFF])  # shape of earth: spherical r=6371229 m, no scale
        + b"\xff\xff\xff\xff"  # scaled radius (missing)
        + bytes([0xFF]) + b"\xff\xff\xff\xff"  # major axis sf + value (missing)
        + bytes([0xFF]) + b"\xff\xff\xff\xff"  # minor axis sf + value (missing)
    )
    if spec_t is not None:
        # Template 3.50 (spherical harmonic coefficients): J/K/M
        # pentagonal resolution parameters (triangular here: all T),
        # representation type 1 (associated Legendre of the first
        # kind), mode 1 (the standard complex ordering m = 0..M,
        # n = m..J).  Section 3's point count holds the number of
        # COMPLEX coefficients; there is no optional list.
        s3 = section(
            3,
            bytes([0])
            + struct.pack(">I", nj)  # (T+1)(T+2)/2 complex coefficients
            + bytes([0, 0])
            + struct.pack(">H", 50)
            + struct.pack(">III", spec_t, spec_t, spec_t)
            + bytes([1, 1]),  # representation type 1, mode 1
        )
    elif mercator is not None:
        # Template 3.10 (Mercator, true scale at LaD): La2/Lo2 derive
        # from the mesh; Di/Dj ride in millimetres at LaD.  ``mercator``
        # keys: la1, lo1 (degrees of cell 0,0), lad, dx_m, dy_m.
        mx1, my1 = mercator_forward(
            mercator["la1"], mercator["lo1"], mercator["lad"],
            _EARTH_RADIUS_M[6],
        )
        sj_enc = 1.0 if scanning_mode & 0x40 else -1.0
        la2, lo2 = mercator_inverse(
            float(mx1) + (ni - 1) * mercator["dx_m"],
            float(my1) + sj_enc * (nj - 1) * mercator["dy_m"],
            mercator["lad"],
            _EARTH_RADIUS_M[6],
        )
        tmpl310 = (
            earth
            + struct.pack(">I", ni)
            + struct.pack(">I", nj)
            + _s32be(int(round(mercator["la1"] * 1e6)))
            + _s32be(int(round(mercator["lo1"] * 1e6)))
            + bytes([0x08])
            + _s32be(int(round(mercator["lad"] * 1e6)))
            + _s32be(int(round(float(la2) * 1e6)))
            + _s32be(int(round(float(lo2) * 1e6)))
            + bytes([scanning_mode])
            + struct.pack(">I", 0)  # orientation
            + struct.pack(">I", int(round(mercator["dx_m"] * 1e3)))
            + struct.pack(">I", int(round(mercator["dy_m"] * 1e3)))
        )
        s3 = section(
            3,
            bytes([0])
            + struct.pack(">I", ni * nj)
            + bytes([0, 0])
            + struct.pack(">H", 10)
            + tmpl310,
        )
    elif polar_stereo is not None:
        # Template 3.20 (polar stereographic, north aspect): the 3.30
        # layout truncated after the scanning mode (no standard
        # parallels).  ``polar_stereo`` keys: la1, lo1 (degrees of cell
        # 0,0), lad (true-scale latitude), lov (orientation), dx_m,
        # dy_m (metres).
        tmpl320 = (
            earth
            + struct.pack(">I", ni)
            + struct.pack(">I", nj)
            + _s32be(int(round(polar_stereo["la1"] * 1e6)))
            + _s32be(int(round(polar_stereo["lo1"] * 1e6)))
            + bytes([0x08])
            + _s32be(int(round(polar_stereo["lad"] * 1e6)))
            + _s32be(int(round(polar_stereo["lov"] * 1e6)))
            + struct.pack(">I", int(round(polar_stereo["dx_m"] * 1e3)))
            + struct.pack(">I", int(round(polar_stereo["dy_m"] * 1e3)))
            + bytes([0])  # projection centre: north pole
            + bytes([scanning_mode])
        )
        s3 = section(
            3,
            bytes([0])
            + struct.pack(">I", ni * nj)
            + bytes([0, 0])
            + struct.pack(">H", 20)
            + tmpl320,
        )
    elif lambert is not None:
        # Template 3.30 (Lambert conformal conic): Nx/Ny share 3.0's
        # octets, then La1/Lo1, LaD/LoV, Dx/Dy in MILLImetres, the
        # projection-centre flag, scanning mode, and the two standard
        # parallels. ``lambert`` keys: la1, lo1 (degrees of cell 0,0),
        # lad, lov, latin1, latin2 (degrees), dx_m, dy_m (metres).
        tmpl330 = (
            earth
            + struct.pack(">I", ni)
            + struct.pack(">I", nj)
            + _s32be(int(round(lambert["la1"] * 1e6)))
            + _s32be(int(round(lambert["lo1"] * 1e6)))
            + bytes([0x08])  # resolution/component flags (u/v grid-relative)
            + _s32be(int(round(lambert["lad"] * 1e6)))
            + _s32be(int(round(lambert["lov"] * 1e6)))
            + struct.pack(">I", int(round(lambert["dx_m"] * 1e3)))
            + struct.pack(">I", int(round(lambert["dy_m"] * 1e3)))
            + bytes([0])  # projection centre: north pole on plane
            + bytes([scanning_mode])
            + _s32be(int(round(lambert["latin1"] * 1e6)))
            + _s32be(int(round(lambert["latin2"] * 1e6)))
            + _s32be(-90_000_000)  # south pole of projection
            + _s32be(0)
        )
        s3 = section(
            3,
            bytes([0])
            + struct.pack(">I", ni * nj)
            + bytes([0, 0])
            + struct.pack(">H", 30)
            + tmpl330,
        )
    elif reduced_arr is not None:
        # Template 3.40, REDUCED form: Ni and Di are coded missing and
        # the points-per-parallel list rides after the 72-octet
        # template body (2-octet entries, interpretation 1 — full
        # circles), the layout ERA5's native archives ship.
        lats = gaussian_latitudes(nj)
        nmax = int(reduced_arr.max())
        tmpl340 = (
            earth
            + b"\xff\xff\xff\xff"  # Ni: coded missing (per-row counts)
            + struct.pack(">I", nj)
            + struct.pack(">I", 0)  # basic angle
            + b"\xff\xff\xff\xff"  # subdivisions (missing)
            + _s32be(int(round(lats[0] * 1e6)))
            + _s32be(lon_first_udeg)
            + bytes([0x00])  # resolution flags: no common i-increment
            + _s32be(int(round(lats[-1] * 1e6)))
            + _s32be(lon_first_udeg + int(round((nmax - 1) * 360e6 / nmax)))
            + b"\xff\xff\xff\xff"  # Di: coded missing
            + struct.pack(">I", nj // 2)  # N
            + bytes([scanning_mode])
        )
        s3 = section(
            3,
            bytes([0])
            + struct.pack(">I", int(reduced_arr.sum()))
            + bytes([2, 1])  # list entry width 2, points per full row
            + struct.pack(">H", 40)
            + tmpl340
            + b"".join(struct.pack(">H", int(n)) for n in reduced_arr),
        )
    elif gaussian:
        # Template 3.40: identical octet layout to 3.0 except La1/La2
        # are the first/last GAUSSIAN latitudes and the Dj field holds
        # N (parallels pole-to-equator).  Caller lat/dlat kwargs are
        # ignored for the latitude axis — the grid IS the quadrature.
        lats = gaussian_latitudes(nj)
        lat_a = int(round(lats[0] * 1e6))
        lat_b = int(round(lats[-1] * 1e6))
        dj_field = struct.pack(">I", nj // 2)
    else:
        lat_a = lat_first_udeg if scanning_mode == 0 else lat_first_udeg - (nj - 1) * dlat_udeg
        lat_b = lat_first_udeg - (nj - 1) * dlat_udeg if scanning_mode == 0 else lat_first_udeg
        dj_field = struct.pack(">I", dlat_udeg)
    if (
        spec_t is None
        and lambert is None
        and polar_stereo is None
        and mercator is None
        and reduced_arr is None
    ):
        tmpl30 = (
        earth
        + struct.pack(">I", ni)
        + struct.pack(">I", nj)
        + struct.pack(">I", 0)  # basic angle
        + b"\xff\xff\xff\xff"  # subdivisions (missing)
        + _s32be(lat_a)
        + _s32be(lon_first_udeg)
        + bytes([0x30])  # resolution/component flags: both increments given
        + _s32be(lat_b)
        + _s32be(lon_first_udeg + (ni - 1) * dlon_udeg)
        + struct.pack(">I", dlon_udeg)
        + dj_field
        + bytes([scanning_mode])  # 0x00 = +i,−j; 0x40 = +i,+j (south first)
        )
        # Template 3.1 (ROTATED lat/lon): the 3.0 body verbatim — its
        # La1/Lo1/Di/Dj are coordinates IN THE ROTATED SYSTEM — plus
        # the southern pole of projection and the angle of rotation
        # (microdegrees, signed-magnitude, the g2clib template layout).
        tmpl_extra = b""
        tmpl_num = 40 if gaussian else 0
        if rotated is not None:
            tmpl_num = 1
            tmpl_extra = (
                _s32be(int(round(float(rotated["south_pole_lat"]) * 1e6)))
                + _s32be(int(round(float(rotated["south_pole_lon"]) * 1e6)))
                + _s32be(int(round(float(rotated.get("angle", 0.0)) * 1e6)))
            )
        if stretched is not None:
            # Template 3.2 (stretched) appends the pole of stretching
            # (µdeg signed-magnitude) + the stretching factor ×10^6;
            # template 3.3 (stretched AND rotated) appends it AFTER the
            # rotation block — the grid axes are coordinates in the
            # rotated-and-stretched system.
            tmpl_num = 3 if rotated is not None else 2
            tmpl_extra += (
                _s32be(int(round(float(stretched["pole_lat"]) * 1e6)))
                + _s32be(int(round(float(stretched["pole_lon"]) * 1e6)))
                + struct.pack(
                    ">I", int(round(float(stretched["factor"]) * 1e6))
                )
            )
        s3 = section(
            3,
            bytes([0])
            + struct.pack(">I", ni * nj)
            + bytes([0, 0])
            + struct.pack(">H", tmpl_num)
            + tmpl30
            + tmpl_extra,
        )
    # ``statistical`` selects product definition template 4.8
    # (statistical processing over a time interval — accumulations /
    # averages); keys: ``process`` (code table 4.10), ``interval_end``
    # (y, m, d, h, mi) and ``range_hours``; optional ``inner_specs``
    # (list of dicts with ``process``/``range_hours``) appends further
    # time-range specifications for COMPOUND statistics ("average of
    # daily maxima" is n = 2).  ``ensemble`` (keys: ``type`` code table
    # 4.6, ``member``, ``size``) selects 4.1; ``derived`` (keys:
    # ``type`` code table 4.7, ``size``) selects 4.2 (derived forecast
    # from all members — ensemble mean / spread); ``probability`` (keys:
    # ``number``, ``total``, ``type`` code table 4.9, optional
    # ``lower``/``upper`` = (scale factor, scaled value) threshold
    # pairs, absent → coded missing) selects 4.5; ``percentile``
    # (0-100) selects 4.6.  Combined with ``statistical`` they become
    # 4.11 / 4.12 / 4.9 / 4.10, whose statistical block follows the
    # family's extra octets.  Octets 10-34 are identical to 4.0 across
    # all ten, so one parser serves them on decode.  ``satellite``
    # (key ``bands``: list of dicts with ``series``/``number``/
    # ``instrument`` and the central wave number as an exact
    # (``scale``, ``value``) pair; optional ``simulated=True``,
    # ``process``) selects 4.31 (observation — no lead octets, reject
    # ``forecast``) or 4.32 (simulated imagery — keeps the lead
    # block); NEITHER has fixed surfaces, so explicit level kwargs
    # reject loudly.
    n_products = sum(
        x is not None
        for x in (
            ensemble, derived, probability, percentile, spatial, cluster,
            satellite, radar,
        )
    ) + (1 if error else 0)
    if n_products > 1 and not (
        n_products == 2 and ensemble is not None and satellite is not None
    ):
        # the ONE legal pairing is ensemble + satellite — the
        # ensemble-simulated-satellite templates 4.33/4.34
        raise ValueError(
            "choose at most one of ensemble / derived / probability / "
            "percentile / spatial / cluster / error / satellite / "
            "radar (except ensemble + satellite = templates 4.33/4.34)"
        )
    if satellite is not None and ensemble is not None and not satellite.get(
        "simulated"
    ):
        # 4.33/4.34 are defined for SIMULATED (synthetic) satellite
        # data only — there is no observational-ensemble template
        raise ValueError(
            "ensemble satellite products are the SIMULATED templates "
            "4.33/4.34 — pass simulated=True"
        )
    if satellite is not None and statistical is not None and ensemble is None:
        # 4.31/4.32 have no statistical siblings in the supported set —
        # the band list occupies the octets a 4.8 block would start at
        # (the ensemble form 4.34 is the only statistical satellite)
        raise ValueError(
            "satellite (templates 4.31/4.32) does not combine with "
            "statistical without ensemble (template 4.34)"
        )
    if radar is not None and (
        statistical is not None or forecast is not None
    ):
        # 4.20 is an observation at the reference time: no lead
        # octets, no statistical block
        raise ValueError(
            "radar (template 4.20) does not combine with forecast or "
            "statistical"
        )
    if radar is not None and (
        level2 is not None
        or (level_type, level_scale, level_value) != (1, 0, 0)
    ):
        raise ValueError(
            "radar template 4.20 carries no fixed surfaces — level "
            "kwargs do not apply"
        )
    if satellite is not None and level2 is not None:
        raise ValueError(
            "satellite templates carry no fixed surfaces — level2 "
            "does not apply"
        )
    if satellite is not None and (
        (level_type, level_scale, level_value) != (1, 0, 0)
    ):
        # same loudness as the level2 check: 4.31/4.32 have no level
        # octets, so an explicitly-passed first surface would be
        # silently discarded — a caller porting a 4.0 encode must hear
        # about it, not ship a structurally valid message with the
        # level gone
        raise ValueError(
            "satellite templates carry no fixed surfaces — "
            "level_type/level_scale/level_value do not apply"
        )
    if (
        satellite is not None
        and not satellite.get("simulated")
        and forecast is not None
    ):
        raise ValueError(
            "template 4.31 is an observation at the reference time — "
            "it has no forecast-time octets (use simulated=True for "
            "the 4.32 forecast form)"
        )
    if error and statistical is not None:
        # 4.7 has no statistical sibling in the 4.x numbering — the
        # combination would have to masquerade as 4.8, silently
        # dropping the error marking
        raise ValueError(
            "error (template 4.7) does not combine with statistical"
        )
    if spatial is not None and statistical is not None:
        # 4.15 has no statistical-interval sibling in the supported set
        # — the spatial statistic IS the processing, over area not time
        raise ValueError(
            "spatial (template 4.15) does not combine with statistical"
        )
    if chemistry is not None and aerosol is not None:
        # one inserted block per template — the 4.x numbering has no
        # combined chemistry+aerosol form
        raise ValueError("chemistry and aerosol are mutually exclusive")
    if chemistry is not None or aerosol is not None:
        for bad, what in (
            (derived, "derived"), (probability, "probability"),
            (percentile, "percentile"), (cluster, "cluster"),
            (spatial, "spatial"), (satellite, "satellite"),
            (radar, "radar"),
        ):
            if bad is not None:
                raise ValueError(
                    f"chemistry/aerosol does not combine with {what} "
                    "(the 4.40-4.48 family has only plain / ensemble / "
                    "statistical forms)"
                )
        if error:
            raise ValueError(
                "chemistry/aerosol does not combine with error"
            )
    if aerosol is not None and statistical is not None and (
        "first_wavelength" in aerosol or "second_wavelength" in aerosol
    ):
        # 4.48/4.49 (aerosol + optical wavelength interval, plain /
        # ensemble) have no statistical sibling in the 4.x numbering
        raise ValueError(
            "aerosol wavelength interval (templates 4.48/4.49) does "
            "not combine with statistical"
        )
    if model_version is not None:
        # 4.60/4.61 (individual ensemble REFORECAST — the GEFS v12
        # reforecast archive form): 4.1/4.11 plus the model-version
        # date appended after the ensemble octets.
        if ensemble is None:
            raise ValueError(
                "model_version (reforecast templates 4.60/4.61) "
                "requires ensemble"
            )
        if chemistry is not None or aerosol is not None:
            raise ValueError(
                "model_version does not combine with chemistry/aerosol"
            )
    # ``forecast`` (keys: ``unit`` code table 4.4, ``value``) sets the
    # lead-time octets shared by the whole 4.0 family; default is an
    # analysis field (hour unit, lead 0).  Only units the decoder can
    # convert to whole hours are accepted — encoding a calendar unit
    # would produce a message the engine itself rejects.
    if forecast is None:
        fc_unit, fc_value = 1, 0
    else:
        fc_unit, fc_value = int(forecast["unit"]), int(forecast["value"])
        if not 0 <= fc_value < 1 << 31:
            raise ValueError(f"forecast time {fc_value} out of range")
        _forecast_hours(fc_unit, fc_value)  # validates unit/divisibility
    # ``level2`` (keys: ``type``, ``value``, optional ``scale``) fills
    # the second fixed surface — otherwise coded missing (point level).
    if level2 is None:
        sfc2 = bytes([0xFF, 0xFF]) + b"\xff\xff\xff\xff"
    else:
        t2 = _pdt_octet(level2["type"], "second fixed surface type")
        sc2, v2 = int(level2.get("scale", 0)), int(level2["value"])
        if not -127 <= sc2 <= 127:
            raise ValueError(f"second-surface scale factor {sc2} out of range")
        if not 0 <= v2 < 0xFFFFFFFF:  # all-ones is the missing sentinel
            raise ValueError(f"second-surface value {v2} out of range")
        sfc2 = bytes(
            [t2, (0x80 | abs(sc2)) if sc2 < 0 else sc2]
        ) + struct.pack(">I", v2)
    pdt_extra = b""
    if ensemble is not None:
        tmpl4 = 11 if statistical is not None else 1
        pdt_extra += bytes(
            [
                _pdt_octet(ensemble["type"], "ensemble type"),
                _pdt_octet(ensemble["member"], "ensemble member"),
                _pdt_octet(ensemble["size"], "ensemble size"),
            ]
        )
        if model_version is not None:
            # 4.60/4.61: the model-version date (YYYY-MM-DD hh:mm:ss)
            # appended AFTER the ensemble octets, before the 4.61
            # statistical block — the reforecast form GEFS v12
            # archives ship.
            tmpl4 = 61 if statistical is not None else 60
            my, mmo, md, mh, mmi, msec = (int(x) for x in model_version)
            if not (
                1 <= mmo <= 12 and 1 <= md <= 31 and mh < 24
                and mmi < 60 and msec < 60
            ):
                raise ValueError(
                    f"model version date {model_version} out of range"
                )
            pdt_extra += struct.pack(">H", my) + bytes(
                [mmo, md, mh, mmi, msec]
            )
    elif derived is not None:
        tmpl4 = 12 if statistical is not None else 2
        pdt_extra += bytes(
            [
                _pdt_octet(derived["type"], "derived forecast type"),
                _pdt_octet(derived["size"], "ensemble size"),
            ]
        )
    elif probability is not None:
        tmpl4 = 9 if statistical is not None else 5
        pdt_extra += bytes(
            [
                _pdt_octet(probability["number"], "forecast probability number"),
                _pdt_octet(probability["total"], "total forecast probabilities"),
                _pdt_octet(probability["type"], "probability type"),
            ]
        )
        pdt_extra += _scaled_pair(probability.get("lower"))
        pdt_extra += _scaled_pair(probability.get("upper"))
    elif percentile is not None:
        tmpl4 = 10 if statistical is not None else 6
        p = _pdt_octet(percentile, "percentile value")
        if p > 100:
            raise ValueError(f"percentile value {p} out of range 0-100")
        pdt_extra += bytes([p])
    elif cluster is not None:
        # Templates 4.3 (``bounds`` = (north, south, east, west) µdeg
        # rectangular domain) / 4.4 (``center`` = (lat µdeg, lon µdeg,
        # radius) circular domain): the 4.2 derived octets, the
        # cluster block, the domain geometry, the in-cluster standard
        # deviation / distance from the ensemble mean as (scale,
        # scaled value) pairs (absent → coded missing), then the
        # member numbers (their count IS NC).  Combined with
        # ``statistical`` they become 4.13 / 4.14, whose statistical
        # block follows the member list (the generic append below
        # lands it there).
        has_bounds = "bounds" in cluster
        has_center = "center" in cluster
        if has_bounds == has_center:
            raise ValueError(
                "cluster needs exactly one of bounds=(n, s, e, w) "
                "(template 4.3) or center=(lat, lon, radius) "
                "(template 4.4)"
            )
        if statistical is not None:
            tmpl4 = 13 if has_bounds else 14
        else:
            tmpl4 = 3 if has_bounds else 4
        members = list(cluster["members"])
        if not 1 <= len(members) <= 254:
            raise ValueError(
                f"cluster member count {len(members)} out of range 1-254"
            )
        geometry = cluster["bounds"] if has_bounds else cluster["center"]
        pdt_extra += bytes(
            [
                _pdt_octet(cluster["type"], "derived forecast type"),
                _pdt_octet(cluster["size"], "ensemble size"),
                _pdt_octet(cluster["identifier"], "cluster identifier"),
                0xFF if cluster.get("hires") is None
                else _pdt_octet(cluster["hires"], "high-resolution cluster"),
                0xFF if cluster.get("lores") is None
                else _pdt_octet(cluster["lores"], "low-resolution cluster"),
                _pdt_octet(cluster["total"], "total number of clusters"),
                _pdt_octet(cluster["method"], "clustering method"),
            ]
        )
        for g in geometry:
            pdt_extra += _s32be(int(g))
        pdt_extra += bytes([len(members)])
        pdt_extra += _scaled_pair(cluster.get("stddev"))
        pdt_extra += _scaled_pair(cluster.get("distance"))
        pdt_extra += bytes(_pdt_octet(m, "cluster member") for m in members)
    elif spatial is not None:
        # Template 4.15 (spatio-statistical processing — NDFD-style
        # smoothed/re-gridded products): octets 35-37 carry the
        # statistical process used WITHIN the spatial area (code table
        # 4.10), the type of spatial processing (code table 4.15) and
        # the number of data points used.
        tmpl4 = 15
        pdt_extra += bytes(
            [
                _pdt_octet(spatial["stat"], "spatial statistical process"),
                _pdt_octet(spatial["type"], "spatial processing type"),
                _pdt_octet(spatial["points"], "spatial data-point count"),
            ]
        )
    elif error:
        # template 4.7: analysis/forecast error — 4.0's exact layout,
        # distinguished only by the template number
        tmpl4 = 7
    else:
        tmpl4 = 8 if statistical is not None else 0
    if statistical is not None:
        ey, em, ed, eh, emi = statistical["interval_end"]
        specs = [(statistical["process"], statistical["range_hours"])]
        for sp in statistical.get("inner_specs") or []:
            specs.append((sp["process"], sp["range_hours"]))
        pdt_extra += (
            struct.pack(">H", ey)
            + bytes([em, ed, eh, emi, 0])  # end of interval (sec = 0)
            + bytes(
                [_pdt_octet(len(specs), "time-range specification count")]
            )
            + struct.pack(">I", 0)  # no missing values in interval
        )
        for proc, hours in specs:  # outermost first, per the spec
            pdt_extra += (
                bytes([_pdt_octet(proc, "statistical process")])
                + bytes([2])  # time-increment type: successive fields
                + bytes([1])  # range time unit: hour
                + struct.pack(">I", hours)
                + bytes([1])  # increment time unit: hour
                + struct.pack(">I", 0)  # continuous processing
            )
    chem_insert = b""
    if chemistry is not None:
        # Templates 4.40-4.43: the base form (0/1/8/11 decided above)
        # plus the 2-octet code-table-4.230 constituent type inserted
        # after the parameter number.
        ct = int(chemistry)
        if not 0 <= ct <= 0xFFFE:
            raise ValueError(
                f"chemical constituent type {ct} out of range 0-65534 "
                "(65535 is the missing sentinel)"
            )
        chem_insert = struct.pack(">H", ct)
        tmpl4 = {0: 40, 1: 41, 8: 42, 11: 43}[tmpl4]
    elif aerosol is not None:
        # Templates 4.44-4.48: aerosol type (code table 4.233), the
        # code-table-4.91 size-interval type and the two sizes as
        # signed-magnitude (scale, value) pairs in metres; 4.48 adds
        # the optical wavelength interval the same way.
        at = int(aerosol["type"])
        if not 0 <= at <= 0xFFFE:
            raise ValueError(
                f"aerosol type {at} out of range 0-65534 "
                "(65535 is the missing sentinel)"
            )
        def _interval_octet(key: str, what: str) -> bytes:
            v = aerosol.get(key)
            if v is None:
                return b"\xff"  # coded missing
            return bytes([_pdt_octet(v, what)])

        chem_insert = (
            struct.pack(">H", at)
            + _interval_octet("size_interval", "aerosol size-interval type")
            + _scaled_pair(aerosol.get("first_size"))
            + _scaled_pair(aerosol.get("second_size"))
        )
        if "first_wavelength" in aerosol or "second_wavelength" in aerosol:
            chem_insert += (
                _interval_octet(
                    "wavelength_interval", "aerosol wavelength-interval type"
                )
                + _scaled_pair(aerosol.get("first_wavelength"))
                + _scaled_pair(aerosol.get("second_wavelength"))
            )
            # 4.48 plain / 4.49 individual ensemble member (the CAMS
            # AOD-ensemble form); the statistical combination was
            # rejected above
            tmpl4 = {0: 48, 1: 49}[tmpl4]
        else:
            tmpl4 = {0: 44, 1: 45, 8: 46, 11: 47}[tmpl4]
    if satellite is not None:
        # Templates 4.31 (observational satellite product) / 4.32
        # (simulated satellite imagery, ``simulated=True`` — keeps the
        # family's generating-process + lead block): ``bands`` is a
        # list of dicts with ``series`` / ``number`` / ``instrument``
        # and the central wave number as an exact (``scale``,
        # ``value``) pair (m^-1 = value · 10^-scale).  No fixed
        # surfaces — the band list stands where the family's level
        # octets would be.
        bands = list(satellite["bands"])
        if not 1 <= len(bands) <= 254:
            raise ValueError(
                f"spectral band count {len(bands)} out of range 1-254"
            )
        deprecated = bool(satellite.get("deprecated"))
        if deprecated and (
            satellite.get("simulated") or ensemble is not None
        ):
            # 4.30 is the deprecated OBSERVATIONAL form only — the
            # simulated/ensemble combinations postdate its retirement
            raise ValueError(
                "template 4.30 (deprecated satellite) is observational "
                "only — it has no simulated or ensemble forms"
            )
        band_bytes = b""
        for b in bands:
            if deprecated:
                # 4.30's band block is one octet NARROWER: the
                # instrument type is a single octet (the layout shear
                # hazard that kept this template a named boundary)
                band_bytes += struct.pack(
                    ">HH", int(b["series"]), int(b["number"])
                ) + bytes(
                    [_pdt_octet(b["instrument"], "instrument type")]
                )
            else:
                band_bytes += struct.pack(
                    ">HHH",
                    int(b["series"]),
                    int(b["number"]),
                    int(b["instrument"]),
                )
            bsc, bv = int(b.get("scale", 0)), int(b["value"])
            # A wave number is a magnitude: the wire value is
            # sign-magnitude (like every GRIB2 scaled value), so a
            # raw value >= 2^31 would decode as NEGATIVE — reject it
            # here rather than silently corrupting the band.
            if not 0 <= bv < 1 << 31:
                raise ValueError(
                    f"central-wave-number value {bv} out of range"
                )
            # _scaled_pair emits the same 1+4-octet signed-magnitude
            # layout and rejects the -127-scale / all-ones-value
            # sentinel collisions a local reimplementation missed.
            band_bytes += _scaled_pair((bsc, bv))
        if satellite.get("simulated"):
            # 4.32, or the ensemble forms 4.33 (point in time) / 4.34
            # (statistical interval) — all three keep 4.0's
            # generating-process + lead block; the ensemble octets and
            # (4.34) the statistical block ride in pdt_extra, built by
            # the generic branches above in exactly the band-list-
            # relative order the spec puts them.
            if ensemble is not None:
                tmpl4 = 34 if statistical is not None else 33
            else:
                tmpl4 = 32
            sat_body = (
                bytes([category, number, 2, 0, 0])
                + b"\x00\x00"  # hours of cutoff
                + bytes([0])  # minutes
                + bytes([fc_unit])
                + struct.pack(">I", fc_value)
            )
        else:
            tmpl4 = 30 if deprecated else 31
            sat_body = bytes(
                [
                    category,
                    number,
                    8,  # type of generating process: observation
                    _pdt_octet(
                        satellite.get("process", 0),
                        "observation generating process identifier",
                    ),
                ]
            )
        s4 = section(
            4,
            struct.pack(">H", 0)  # number of coordinate values
            + struct.pack(">H", tmpl4)
            + sat_body
            + bytes([len(bands)])
            + band_bytes
            # 4.33/4.34 only (empty otherwise): ensemble octets, then
            # the 4.34 statistical block, AFTER the band list
            + pdt_extra,
        )
    elif radar is not None:
        # Template 4.20 (radar product): the site block — number of
        # sites, time unit, site latitude/longitude (signed-magnitude
        # µdeg), elevation (m), CCITT-IA5 + numeric site ids, operating
        # mode (code table 4.12), calibration/QC/clutter octets,
        # antenna elevation, accumulation interval, echo-top reference
        # and the bin/radial spacings.  No fixed surfaces, no lead.
        tmpl4 = 20
        sid = str(radar.get("site_id", "XXXX"))
        if len(sid) != 4 or not sid.isascii():
            raise ValueError(
                f"radar site id {sid!r} must be 4 CCITT IA5 characters"
            )
        # None → the all-ones sign-magnitude coded-missing word, like
        # the sibling elevation/id/number/mode fields (a real product
        # may carry no site coordinates); range checks apply only to
        # PRESENT coordinates.
        if radar.get("lat_udeg") is None:
            lat_bytes = b"\xff\xff\xff\xff"
        else:
            site_lat = int(radar["lat_udeg"])
            if not -90_000_000 <= site_lat <= 90_000_000:
                raise ValueError(
                    f"radar site latitude {site_lat} out of range"
                )
            lat_bytes = _s32be(site_lat)
        if radar.get("lon_udeg") is None:
            lon_bytes = b"\xff\xff\xff\xff"
        else:
            site_lon = int(radar["lon_udeg"])
            if not -180_000_000 <= site_lon <= 360_000_000:
                raise ValueError(
                    f"radar site longitude {site_lon} out of range"
                )
            lon_bytes = _s32be(site_lon)
        elev = int(radar.get("elevation_m", 0))
        if not 0 <= elev < 0xFFFF:
            raise ValueError(f"radar site elevation {elev} out of range")
        snum = int(radar.get("site_number", 0))
        if not 0 <= snum < 0xFFFF:
            raise ValueError(f"radar site number {snum} out of range")
        s4 = section(
            4,
            struct.pack(">H", 0)  # number of coordinate values
            + struct.pack(">H", tmpl4)
            + bytes(
                [
                    category,
                    number,
                    8,  # type of generating process: observation
                    _pdt_octet(radar.get("sites", 1), "radar site count"),
                    1,  # indicator of unit of time range: hour
                ]
            )
            + lat_bytes
            + lon_bytes
            + struct.pack(">H", elev)
            + sid.encode("ascii")
            + struct.pack(">H", snum)
            + bytes(
                [
                    _pdt_octet(radar.get("mode", 0), "radar operating mode"),
                    _pdt_octet(
                        radar.get("calibration", 0),
                        "reflectivity calibration constant",
                    ),
                    _pdt_octet(radar.get("qc", 0), "quality control indicator"),
                    _pdt_octet(
                        radar.get("clutter", 0), "clutter filter indicator"
                    ),
                    _pdt_octet(
                        radar.get("antenna_elevation", 0),
                        "constant antenna elevation angle",
                    ),
                ]
            )
            + struct.pack(">H", int(radar.get("accumulation_minutes", 0)))
            + bytes(
                [
                    _pdt_octet(
                        radar.get("echo_top_reference", 0),
                        "reference reflectivity for echo top",
                    )
                ]
            )
            + int(radar.get("bin_spacing_m", 0)).to_bytes(3, "big")
            + struct.pack(">H", int(radar.get("radial_spacing", 0))),
        )
    else:
        s4 = section(
            4,
            struct.pack(">H", 0)  # number of coordinate values
            + struct.pack(">H", tmpl4)
            + bytes([category, number])
            # 4.40-4.48 constituent/aerosol block — empty otherwise
            + chem_insert
            + bytes([2, 0, 0])  # process type, background/forecast ids
            + b"\x00\x00"  # hours of cutoff
            + bytes([0])  # minutes
            + bytes([fc_unit])  # time unit (code table 4.4)
            + struct.pack(">I", fc_value)  # forecast time in those units
            # Fixed surface 1 through the shared validated encoders:
            # the type octet 0-255 (255 = the missing sentinel, legal
            # explicitly), the (scale, value) pair signed-magnitude
            # with the -127-scale / all-ones-value sentinel collisions
            # rejected — '& 0xFF' masking here silently encoded a
            # DIFFERENT surface type.
            + bytes([_surface_type_octet(level_type)])
            + _scaled_pair((level_scale, level_value))
            + sfc2  # fixed surface 2 (layer bottom, or all-ones missing)
            + pdt_extra,
        )
    s5 = section(5, s5_body)
    if bm is not None:
        bm_bits = np.packbits(bm.reshape(-1).astype(np.uint8)).tobytes()
        s6 = section(6, bytes([0]) + bm_bits)
    else:
        s6 = section(6, bytes([255]))
    s7 = section(7, s7_body)
    body = s1 + s3 + s4 + s5 + s6 + s7
    total = 16 + len(body) + 4
    s0 = MAGIC + bytes([0, 0, discipline, EDITION]) + struct.pack(">Q", total)
    return s0 + body + TERMINATOR


def merge_grib2_fields(msgs: "list[bytes]") -> bytes:
    """Merge single-field GRIB2 messages into ONE multi-field message
    (``0 1 (3 (4 5 6 7))+ 8``) — the submessage layout NDFD-style
    archives ship.  All inputs must share discipline and an identical
    section 1 (one reference time per message is the format's rule); a
    field whose section 3 is byte-identical to the previous field's
    INHERITS it (the grid is not re-emitted), exercising the
    persisting-context form of the spec."""
    if not msgs:
        raise ValueError("merge_grib2_fields needs at least one message")
    parts: list[bytes] = []
    discipline = s1 = prev_s3 = None
    for m in msgs:
        m = bytes(m)
        if m[:4] != MAGIC or m[7] != EDITION:
            raise ValueError("not a GRIB edition-2 message")
        s = _sections(m)
        if 2 in s:
            # silently dropping an input's local-use section would be a
            # lossy merge; the engine never emits one, so stop loudly
            raise ValueError(
                "merge_grib2_fields does not carry section 2 (local use)"
            )
        missing = {1, 3, 4, 5, 6, 7} - set(s)
        if missing:
            # a foreign/truncated input without section 1 or a full 3-7
            # run would otherwise surface as an opaque KeyError
            raise ValueError(
                "merge_grib2_fields input missing section(s) "
                f"{sorted(missing)}"
            )
        if discipline is None:
            discipline, s1 = m[6], s[1]
            parts.append(s1)
        elif m[6] != discipline or s[1] != s1:
            raise ValueError(
                "multi-field messages share one discipline and section 1"
            )
        if s[3] != prev_s3:
            parts.append(s[3])
            prev_s3 = s[3]
        parts.extend(s[k] for k in (4, 5, 6, 7))
    body = b"".join(parts)
    total = 16 + len(body) + 4
    s0 = MAGIC + bytes([0, 0, discipline, EDITION]) + struct.pack(">Q", total)
    return s0 + body + TERMINATOR


def iter_messages2(buf: bytes):
    """Scan a multi-record GRIB2 file: yield each message's exact bytes."""
    buf = bytes(buf)
    pos = 0
    n = len(buf)
    while pos < n:
        idx = buf.find(MAGIC, pos)
        if idx < 0:
            return
        if idx + 16 > n:
            raise ValueError("truncated GRIB2 indicator section")
        if buf[idx + 7] != EDITION:
            raise ValueError(f"unsupported GRIB edition {buf[idx + 7]}")
        (total,) = struct.unpack_from(">Q", buf, idx + 8)
        if total < 20:
            # zeroed/implausible length: end <= idx re-finds the same
            # magic forever, and the terminator check would read bytes
            # BEFORE this message (the previous record's own 7777)
            raise ValueError(
                f"GRIB2 indicator declares impossible length {total}"
            )
        end = idx + total
        if end > n:
            raise ValueError("truncated GRIB2 message")
        if buf[end - 4 : end] != TERMINATOR:
            raise ValueError("missing 7777 terminator")
        yield buf[idx:end]
        pos = end


def _sections(msg: bytes) -> dict[int, bytes]:
    """Split one message into its numbered sections (body bytes include
    the 5-byte section header for offset-stable indexing).

    Repeated sections — GRIB2 legally repeats 4-7 for multi-field
    messages — are REJECTED loudly here: collapsing them to the last
    occurrence would silently decode (and inventory) only the final
    field.  Multi-field messages go through ``_iter_field_sections`` /
    :func:`decode_grib2_fields` instead.  Zero/short section lengths
    are rejected rather than spun on."""
    _check_grib2_envelope(msg)
    out = {0: msg[:16]}
    pos, end = 16, len(msg) - 4
    while pos < end:
        if pos + 5 > end:
            raise ValueError("truncated section header")
        length, number = struct.unpack_from(">IB", msg, pos)
        if length < 5 or pos + length > end:
            raise ValueError(f"malformed section header (length {length})")
        if number in out:
            raise ValueError(
                f"repeated section {number}: this is a multi-field GRIB2 "
                "message — decode it with decode_grib2_fields"
            )
        out[number] = msg[pos : pos + length]
        pos += length
    missing = {1, 3, 4, 5, 6, 7} - set(out)
    if missing:
        raise ValueError(
            f"GRIB2 message missing section(s) {sorted(missing)}"
        )
    return out


def _check_grib2_envelope(msg: bytes) -> None:
    """Indicator + terminator validation shared by every section walk:
    the 64-bit total length must equal the buffer handed in and the
    7777 terminator must close it — without this, a message whose tail
    was torn off (partial download, truncated object) "decodes" from
    whatever bytes remain, and interior truncations surface as raw
    IndexError/struct.error instead of the file defect they are."""
    if len(msg) < 21 or msg[:4] != MAGIC or msg[7] != EDITION:
        raise ValueError("not a GRIB edition-2 message")
    (total,) = struct.unpack_from(">Q", msg, 8)
    if total != len(msg):
        raise ValueError(
            f"GRIB2 message length mismatch (indicator says {total}, "
            f"have {len(msg)} bytes)"
        )
    if msg[-4:] != TERMINATOR:
        raise ValueError("missing 7777 terminator")


def _parse_surface(
    s4: bytes, off: int
) -> tuple[int | None, int | None, int | None]:
    """One fixed-surface block (type octet, signed-magnitude scale
    factor octet, 4-octet scaled value) at byte offset ``off`` of
    section 4 (which here includes its 5-byte header). 0xFF / all-ones
    = coded missing → None — LOUDLY absent rather than a silent 0 a
    level filter would match."""
    level_type = s4[off] if s4[off] != 0xFF else None
    if level_type is None or s4[off + 1] == 0xFF:
        level_scale = None
    else:
        level_scale = (
            -(s4[off + 1] & 0x7F) if s4[off + 1] & 0x80 else s4[off + 1]
        )
    (raw_lv,) = struct.unpack_from(">I", s4, off + 2)
    if level_type is None or raw_lv == 0xFFFFFFFF:
        level_value = None
    else:
        # signed-MAGNITUDE like every other GRIB2 scaled value (a
        # -2 PVU surface is wire 0x80000002) — an unsigned read would
        # label it level 2147483650 on every surface
        level_value = (
            -(raw_lv & 0x7FFFFFFF) if raw_lv & 0x80000000 else raw_lv
        )
    return level_type, level_scale, level_value


def parse_fixed_surface(s4: bytes) -> tuple[int | None, int | None, int | None]:
    """Template 4.0 FIRST fixed surface (octets 23-28): (type, scale
    factor, scaled value). ONE parser shared by the full decode and the
    header-only inventory path, so the two can never disagree on the
    same record's level."""
    return _parse_surface(s4, 22)


def surface_level(value: int | None, scale: int | None) -> int | None:
    """Fixed surface (scaled value, scale factor) → integer level:
    level = value / 10^scale. NULL propagates; a non-integral level
    raises loudly rather than rounding.  ONE helper shared by the
    landing DECODE and (through the lenient wrappers below) every
    inventory surface, so the surfaces can never disagree on the same
    record's level.  The loud stop belongs to the decode path only —
    there a rounded level mis-labels landed values; the inventory
    paths LIST fractional-level records (sigma 0.995, a 0.1 m soil
    depth) like wgrib2 lists every record of a mixed archive."""
    if value is None:
        return None
    if not scale:  # None or 0
        return int(value)
    if scale > 0:
        q, rem = divmod(int(value), 10 ** scale)
        if rem:
            raise ValueError(
                f"fixed-surface value {value}·10^-{scale} is not a whole level"
            )
        return q
    return int(value) * 10 ** (-scale)


def surface_level_lenient(value: int | None, scale: int | None) -> int | None:
    """Inventory-side level for the integer schema column: the whole
    level when it is one, NULL when the surface is fractional (the
    same lenient-NULL convention as non-hour-convertible leads) —
    a one-record sigma level must not abort a whole archive's scan."""
    try:
        return surface_level(value, scale)
    except ValueError:
        return None


def surface_level_text(value: int | None, scale: int | None) -> str:
    """Inventory-LINE rendering of a fixed surface: ``-`` when coded
    missing, the bare integer when whole (so integral archives render
    byte-identically to before), otherwise the EXACT decimal
    (995·10⁻³ → ``0.995``, trailing zeros trimmed) — listed AND
    regex-selectable, the way wgrib2 prints "0.995 sigma level"."""
    if value is None:
        return "-"
    if not scale:  # None or 0
        return str(int(value))
    if scale < 0:
        return str(int(value) * 10 ** (-scale))
    # Scaled values are signed (octet 11's sign bit): format the
    # magnitude, then re-prepend the sign — zero-padding a "-5" would
    # otherwise mangle to "-.5" / "0.-5".
    sign = "-" if int(value) < 0 else ""
    digits = str(abs(int(value))).rjust(scale + 1, "0")
    text = f"{digits[:-scale]}.{digits[-scale:]}".rstrip("0").rstrip(".")
    return sign + text


# Chemistry (4.40-4.43) / aerosol (4.44-4.49) base-template remap: each
# wire template is its 4.0-family base with a constituent / aerosol
# block INSERTED between the parameter number and the generating-
# process octet.
_CHEM_AEROSOL_BASE = {
    40: 0, 41: 1, 42: 8, 43: 11,
    44: 0, 45: 1, 46: 8, 47: 11, 48: 0, 49: 1,
}


def _chem_insert_len(tmpl4: int) -> int:
    """Octet length of the 4.40-4.49 inserted block: 2 (constituent),
    13 (aerosol type + size interval) or 24 (+ wavelength interval)."""
    return 2 if tmpl4 <= 43 else (24 if tmpl4 in (48, 49) else 13)


def _splice_chem_aerosol(s4: bytes, tmpl4: int) -> "tuple[bytes, int]":
    """Splice the 4.40-4.49 insert OUT of section 4 so the remainder
    decodes through the base template's exact offsets — ONE helper
    shared by the full decode, the codec-level inventory and the
    landing inventory (like parse_fixed_surface), so the surfaces can
    never disagree on the family's layout.  Threading +2/+13/+24
    shifts through every downstream branch is the layout-shear hazard
    class that kept 4.30 a boundary for fourteen rounds."""
    ins = _chem_insert_len(tmpl4)
    if len(s4) < 13 + ins:
        raise ValueError(
            f"truncated product definition template 4.{tmpl4}"
        )
    return s4[:11] + s4[11 + ins:], _CHEM_AEROSOL_BASE[tmpl4]



def parse_second_surface(s4: bytes) -> tuple[int | None, int | None, int | None]:
    """Template 4.0 SECOND fixed surface (octets 29-34) — the bottom of
    a LAYER product (0-10 cm soil moisture, a cloud-base-to-top layer,
    the max-wind layer).  Coded missing (the usual case) on point-level
    products; a decoder that never reads these octets collapses every
    layer onto its top surface, indistinguishable from a point level."""
    return _parse_surface(s4, 28)


# Code table 4.4 fixed-duration time units → hours.  Calendar units
# (month/year/decade/normal/century) have no fixed hour length and
# reject loudly; minutes/seconds convert when whole-hour-divisible.
_FORECAST_UNIT_HOURS = {1: 1, 2: 24, 10: 3, 11: 6, 12: 12}


def _forecast_hours(unit: int, value: int) -> int:
    """Code-table-4.4 (unit, value) lead time → WHOLE hours.  GFS-style
    archives use hours (f000-f384) and the 3/6/12-hour units; a
    sub-hour or calendar-unit lead can't be represented in the integer
    ``forecast_hours`` column, so it stops loudly instead of rounding
    — a silently floored lead would mis-stamp every valid time
    downstream."""
    if unit in _FORECAST_UNIT_HOURS:
        return value * _FORECAST_UNIT_HOURS[unit]
    if unit in (0, 13):  # minutes / seconds
        q, rem = divmod(value, 60 if unit == 0 else 3600)
        if rem:
            raise ValueError(
                f"sub-hour forecast lead ({value} in unit {unit}) is not "
                "a whole number of hours"
            )
        return q
    raise ValueError(
        f"unsupported forecast time unit {unit} (calendar-dependent "
        "or reserved)"
    )


def _scaled_limit(s4: bytes, off: int) -> float | None:
    """Template 4.5 threshold pair at ``off``: 1-octet scale factor +
    4-octet scaled value, BOTH signed-magnitude (two's complement would
    decode a negative threshold as a huge magnitude).  Either side
    coded missing (0xFF / all-ones) → None — a probability type that
    doesn't bound that side has NO limit there, not limit 0.  The real
    limit is value / 10^scale."""
    sf = s4[off]
    (raw,) = struct.unpack_from(">I", s4, off + 1)
    if sf == 0xFF or raw == 0xFFFFFFFF:
        return None
    scale = -(sf & 0x7F) if sf & 0x80 else sf
    value = -(raw & 0x7FFFFFFF) if raw & 0x80000000 else raw
    return float(value) / (10.0 ** scale)


def _parse_satellite_bands(
    s4: bytes, nb_off: int, tmpl4: int
) -> tuple[
    int,
    tuple[int, ...],
    tuple[int, ...],
    tuple[int, ...],
    tuple[float | None, ...],
]:
    """Contributing-spectral-band list shared by the satellite family:
    NB at ``nb_off`` (0-based), then NB blocks of satellite series
    (2), satellite number (2), instrument type (2 octets on
    4.31/4.32/4.33/4.34; ONE octet on the deprecated 4.30 — the whole
    reason the templates must dispatch on their own band widths) and
    the central wave number as a (scale factor, scaled value) pair —
    the SAME signed-magnitude convention as every other GRIB2 scaled
    field.  NB absent or zero makes the list length unknowable, so it
    stops loudly (guessing would mis-slice every following octet —
    the same rule as the 4.13/4.14 member list)."""
    blk = 10 if tmpl4 == 30 else 11
    nb = s4[nb_off]
    if nb == 0 or nb == 0xFF:
        raise ValueError(
            f"product definition template 4.{tmpl4} with no "
            "contributing spectral bands"
        )
    if len(s4) < nb_off + 1 + blk * nb:
        raise ValueError(
            f"truncated product definition template 4.{tmpl4} "
            f"({nb} spectral bands)"
        )
    series, numbers, instruments, waves = [], [], [], []
    for b in range(nb):
        o = nb_off + 1 + blk * b
        if tmpl4 == 30:
            sr, num = struct.unpack_from(">HH", s4, o)
            inst = s4[o + 4]
            wave_off = o + 5
        else:
            sr, num, inst = struct.unpack_from(">HHH", s4, o)
            wave_off = o + 6
        series.append(int(sr))
        numbers.append(int(num))
        instruments.append(int(inst))
        waves.append(_scaled_limit(s4, wave_off))
    return (
        nb,
        tuple(series),
        tuple(numbers),
        tuple(instruments),
        tuple(waves),
    )


def _iter_field_sections(msg: bytes):
    """Walk one GRIB2 message and yield one section dict per FIELD.

    A GRIB2 message legally carries several fields (submessages):
    ``0 1 [2] (3 (4 5 6 7)+)+ 8`` — sections 1-3 persist across the
    fields that follow them (NDFD-style archives inherit one grid for
    every field; ensemble archives repeat section 4-7 runs).  Each
    yielded dict holds sections {0, 1, 3, 4, 5, 6, 7} (+2 when
    present) with the persisting context resolved, so the per-field
    decoder never sees the repetition.  Ordering is enforced: 4→5→6→7
    within a field, no context section inside a field run, no
    truncated trailing field — silent tolerance of a malformed layout
    would mis-attribute payloads to the wrong metadata."""
    msg = bytes(msg)
    _check_grib2_envelope(msg)
    ctx: dict[int, bytes] = {0: msg[:16]}
    pending: dict[int, bytes] = {}
    prev_s6: bytes | None = None
    yielded = False
    pos, n = 16, len(msg)
    while pos < n - 4:
        if pos + 5 > n - 4:
            raise ValueError("truncated section header")
        length, number = struct.unpack_from(">IB", msg, pos)
        if length < 5 or pos + length > n - 4:
            raise ValueError(f"malformed section header (length {length})")
        body = msg[pos : pos + length]
        if number in (1, 2, 3):
            if pending:
                raise ValueError(
                    f"section {number} inside a field's section 4-7 run"
                )
            if number == 1 and 1 in ctx:
                # one reference time per message is the format's rule;
                # fields silently landing under different reftimes would
                # be metadata corruption
                raise ValueError("repeated section 1 (one per message)")
            if number == 3 and body != ctx.get(3):
                # a new grid invalidates any previously defined bitmap —
                # a 254 reuse across grids would mask the wrong cells
                prev_s6 = None
            ctx[number] = body
        elif number in (4, 5, 6, 7):
            if set(pending) != set(range(4, number)):
                raise ValueError(
                    f"section {number} out of order within a field"
                )
            if number == 6:
                # Bitmap indicator 254: the previously DEFINED bitmap
                # (indicator 0) applies to this field — resolved here by
                # substituting that section, the same persisting-context
                # treatment sections 1-3 get, so the per-field decoder
                # never sees the indirection.  (Downstream total_bytes
                # accounting counts the RESOLVED section, consistent
                # with inherited-context counting.)
                if length < 6:
                    raise ValueError(
                        "malformed section 6 (no bitmap indicator octet)"
                    )
                if body[5] == 254:
                    if prev_s6 is None:
                        raise ValueError(
                            "bitmap indicator 254 (reuse) without a "
                            "previously defined bitmap in this message"
                        )
                    body = prev_s6
                elif body[5] == 0:
                    prev_s6 = body
            pending[number] = body
            if number == 7:
                if 1 not in ctx or 3 not in ctx:
                    raise ValueError("field data before sections 1/3")
                yield {**ctx, **pending}
                pending = {}
        else:
            raise ValueError(f"unexpected section number {number}")
        pos += length
        yielded = yielded or number == 7
    if pending:
        raise ValueError("truncated field (message ends before section 7)")
    if not yielded:
        # a message with sections but no 4-7 run is spec-invalid;
        # yielding nothing would drop it from the landing scan silently
        raise ValueError("GRIB2 message contains no fields")


@loud_truncation
def decode_grib2_fields(msg: bytes) -> "list[Grib2Record]":
    """Decode EVERY field of a (possibly multi-field) GRIB2 message, in
    order.  The landing source scans through this, so submessage
    archives land one row per field; :func:`decode_grib2` keeps the
    strict single-field contract."""
    return [_decode_field(s) for s in _iter_field_sections(msg)]


@loud_truncation
def decode_grib2(msg: bytes) -> Grib2Record:
    """Decode one SINGLE-FIELD GRIB2 message.

    Grid templates 3.0 (lat/lon), 3.10 (Mercator), 3.20 (polar
    stereographic), 3.30 (Lambert conformal), 3.40 (global Gaussian,
    regular AND reduced per-row-Ni form), 3.50 (spherical harmonic
    coefficients, triangular), plus the rotated/stretched lat/lon
    forms 3.1/3.2/3.3; product templates 4.0-4.15 (ensemble members,
    derived-ensemble and cluster-derived products, probability
    forecasts, percentile forecasts, analysis/forecast error,
    statistical intervals, spatio-statistical processing — the whole
    operational family; the record's ``product_template`` carries the
    number); data
    representation templates 5.0 (simple), 5.2/5.3 (complex ±
    spatial differencing), 5.40 (JPEG2000), 5.41 (PNG), 5.50/5.51
    (spectral simple/complex packing — must pair with 3.50).  Everything
    else raises — including multi-field messages, which this strict
    single-record API rejects via ``_sections``; use
    :func:`decode_grib2_fields` for those."""
    msg = bytes(msg)
    if msg[:4] != MAGIC or msg[7] != EDITION:
        raise ValueError("not a GRIB edition-2 message")
    return _decode_field(_sections(msg))


def _decode_field(s: dict[int, bytes]) -> Grib2Record:
    """Decode one field from its resolved section dict (the shared body
    of :func:`decode_grib2` and :func:`decode_grib2_fields`)."""
    discipline = s[0][6]

    s1 = s[1]
    year, = struct.unpack_from(">H", s1, 12)
    reftime = (year, s1[14], s1[15], s1[16], s1[17])

    s3 = s[3]
    (tmpl_no,) = struct.unpack_from(">H", s3, 12)
    if tmpl_no not in (0, 1, 2, 3, 10, 20, 30, 40, 50):
        raise ValueError(f"unsupported grid definition template {tmpl_no}")
    spectral_truncation: int | None = None
    if tmpl_no == 50:
        # Template 3.50 (spherical harmonic coefficients): J/K/M
        # pentagonal resolution parameters, representation type
        # (code table 3.6) and mode (3.7).  Only the triangular
        # J = K = M truncation in type-1 (associated Legendre) mode-1
        # ordering is supported -- anything else reorders or redefines
        # the coefficient sequence, and guessing would synthesize a
        # garbage field.  Section 3's point count holds the number of
        # COMPLEX coefficients (T+1)(T+2)/2; there is no grid, so the
        # affine fields are zero and consumers must key on
        # spectral_truncation (the landing scan rejects these records:
        # synthesis to a Gaussian grid -- spectral_synthesis -- is an
        # explicit step, never an implicit georef).
        sg = s3[14:]
        if len(sg) < 14:
            raise ValueError("truncated grid definition template 3.50")
        (sj,) = struct.unpack_from(">I", sg, 0)
        (sk,) = struct.unpack_from(">I", sg, 4)
        (sm,) = struct.unpack_from(">I", sg, 8)
        if not (sj == sk == sm) or sj < 1:
            raise ValueError(
                f"only triangular spectral truncation supported "
                f"(J={sj}, K={sk}, M={sm})"
            )
        if sg[12] != 1 or sg[13] != 1:
            raise ValueError(
                f"unsupported spectral representation type {sg[12]} / "
                f"mode {sg[13]}"
            )
        npairs = (sj + 1) * (sj + 2) // 2
        (npoints3,) = struct.unpack_from(">I", s3, 6)
        if npoints3 != npairs:
            raise ValueError(
                f"T{sj} spectrum has {npairs} complex coefficients, "
                f"section 3 declares {npoints3}"
            )
        spectral_truncation = int(sj)
        ni, nj = None, npairs
        row_ni = None
        lambert_params = None
        gaussian_n = None
        latitudes = None
        dlat = dlon = lat_first = lon_first = 0
        scan = 0x00
    else:
        g = s3[14:]  # 3.0/3.1/3.40 share one layout; 3.10/3.20/3.30 share Nx/Ny
        (ni,) = struct.unpack_from(">I", g, 16)
        (nj,) = struct.unpack_from(">I", g, 20)
        row_ni: np.ndarray | None = None
        if tmpl_no == 40 and ni == 0xFFFFFFFF:
            # REDUCED Gaussian grid (ERA5's native archive layout): Ni is
            # coded missing and section 3's optional list (octets 11-12:
            # entry width + interpretation 1 = points per full parallel)
            # carries the number of points on each row, north -> south.
            if nj == 0xFFFFFFFF:
                raise ValueError("grid dimensions coded missing on template 40")
            list_w = s3[10]
            if list_w == 0 or s3[11] != 1:
                raise ValueError(
                    "reduced grid without a points-per-row list "
                    f"(list octets {s3[10]}, interpretation {s3[11]})"
                )
            off = 14 + 58  # template 3.40 body spans section octets 15-72
            if len(s3) < off + nj * list_w:
                raise ValueError("truncated points-per-row list")
            row_ni = np.array(
                [
                    int.from_bytes(s3[off + k * list_w : off + (k + 1) * list_w], "big")
                    for k in range(nj)
                ],
                dtype=np.int64,
            )
            (npoints3,) = struct.unpack_from(">I", s3, 6)
            if int(row_ni.sum()) != npoints3 or (row_ni <= 0).any():
                raise ValueError(
                    "points-per-row list disagrees with the section-3 point count"
                )
            ni = None
        elif ni == 0xFFFFFFFF or nj == 0xFFFFFFFF:
            # quasi-regular geometry on any other template has no per-row
            # machinery here — decoding it with sentinel dims would be
            # silent geography corruption
            raise ValueError(f"grid dimensions coded missing on template {tmpl_no}")
        lambert_params: dict | None = None
        if tmpl_no == 10:
            # Template 3.10 (Mercator): its own octet layout past Lo1 —
            # LaD at g[33], La2/Lo2, scanning at g[45], Di/Dj at g[50]/g[54]
            # in millimetres at LaD.
            if g[0] not in _EARTH_RADIUS_M:
                raise ValueError(
                    f"unsupported shape of earth {g[0]} for projected grids"
                )
            scan = g[45]
            if scan not in (0x00, 0x40):
                raise ValueError(
                    f"unsupported scanning mode 0x{scan:02x} (only +i,±j row-major)"
                )
            (orientation,) = struct.unpack_from(">I", g, 46)
            if orientation != 0:
                # a rotated Mercator grid decoded as orientation-0 would be
                # silent geography corruption
                raise ValueError(
                    f"non-zero Mercator grid orientation {orientation} not supported"
                )
            lambert_params = {
                "kind": "mercator",
                "la1": _rs32be(g, 24) / 1e6,
                "lo1": _rs32be(g, 28) / 1e6,
                "lad": _rs32be(g, 33) / 1e6,
                "dx_m": _projected_increment(g, 50) / 1e3,
                "dy_m": _projected_increment(g, 54) / 1e3,
                "radius_m": _EARTH_RADIUS_M[g[0]],
            }
            if not -90.0 < lambert_params["lad"] < 90.0:
                raise ValueError("degenerate Mercator true-scale latitude")
            lp = lambert_params
            x1, y1 = mercator_forward(
                lp["la1"], lp["lo1"], lp["lad"], lp["radius_m"]
            )
            lp["x1"], lp["y1"] = float(x1), float(y1)
            lp["sj"] = 1.0 if scan & 0x40 else -1.0
            # Cross-check the Di/Dj-derived far corner against the
            # message's stated La2/Lo2: a record whose increments disagree
            # with its declared extent would otherwise decode with
            # silently Di-derived geometry (loud-stop policy).  Tolerance
            # covers µdeg corner rounding plus mm increment rounding
            # accumulated across the mesh.
            la2_stated = _rs32be(g, 37) / 1e6
            lo2_stated = _rs32be(g, 41) / 1e6
            la2_mesh, lo2_mesh = mercator_inverse(
                lp["x1"] + (ni - 1) * lp["dx_m"],
                lp["y1"] + lp["sj"] * (nj - 1) * lp["dy_m"],
                lp["lad"],
                lp["radius_m"],
            )
            dlon_wrap = abs(
                (float(lo2_mesh) - lo2_stated + 180.0) % 360.0 - 180.0
            )
            if abs(float(la2_mesh) - la2_stated) > 1e-3 or dlon_wrap > 1e-3:
                raise ValueError(
                    "Mercator grid increments disagree with the stated far "
                    f"corner: Di/Dj-derived ({float(la2_mesh):.6f}, "
                    f"{float(lo2_mesh):.6f}) vs La2/Lo2 ({la2_stated:.6f}, "
                    f"{lo2_stated:.6f})"
                )
            lat_first = _rs32be(g, 24)
            lon_first = _rs32be(g, 28)
        elif tmpl_no in (20, 30):
            if g[0] not in _EARTH_RADIUS_M:
                raise ValueError(
                    f"unsupported shape of earth {g[0]} for projected grids"
                )
            if g[49] & 0xC0:
                # bit 1 (0x80): south pole on the projection plane; bit 2
                # (0x40): bi-polar symmetric projection — decoding either
                # with a single northern cone would be silent geography
                # corruption.
                raise ValueError(
                    f"unsupported Lambert projection centre flag 0x{g[49]:02x} "
                    "(southern / bi-polar cones not supported)"
                )
            scan = g[50]
            if scan not in (0x00, 0x40):
                raise ValueError(
                    f"unsupported scanning mode 0x{scan:02x} (only +i,±j row-major)"
                )
            lambert_params = {
                "kind": "ps" if tmpl_no == 20 else "lcc",
                "la1": _rs32be(g, 24) / 1e6,
                "lo1": _rs32be(g, 28) / 1e6,
                "lad": _rs32be(g, 33) / 1e6,
                "lov": _rs32be(g, 37) / 1e6,
                "dx_m": _projected_increment(g, 41) / 1e3,
                "dy_m": _projected_increment(g, 45) / 1e3,
                "radius_m": _EARTH_RADIUS_M[g[0]],
            }
            if tmpl_no == 20 and lambert_params["lad"] <= -90.0:
                raise ValueError("degenerate polar-stereographic true-scale latitude")
            lp = lambert_params
            if tmpl_no == 30:
                lp["latin1"] = _rs32be(g, 51) / 1e6
                lp["latin2"] = _rs32be(g, 55) / 1e6
                x1, y1 = lambert_forward(
                    lp["la1"], lp["lo1"], lp["lad"], lp["lov"],
                    lp["latin1"], lp["latin2"], lp["radius_m"],
                )
            else:
                x1, y1 = polar_stereo_forward(
                    lp["la1"], lp["lo1"], lp["lad"], lp["lov"], lp["radius_m"]
                )
            # Anchor + mesh orientation, resolved NOW; the O(cells) inverse
            # runs lazily on first cell_lats/lons_deg access.  +i is always
            # east along a row; scanning bit 0x40 means +j steps +y,
            # otherwise -y.  No row normalization — projected grids have no
            # latitude axis to normalize.
            lp["x1"], lp["y1"] = float(x1), float(y1)
            lp["sj"] = 1.0 if scan & 0x40 else -1.0
            lat_first = _rs32be(g, 24)
            lon_first = _rs32be(g, 28)
        else:
            lat_first = _rs32be(g, 32)
            lon_first = _rs32be(g, 36)
        # Same loud-stop policy as grib1: an unsupported scanning mode
        # reorders cells — decoding it as row-major +i,−j is silent
        # geography corruption; 0x40 (+j, south row first) is a pure row
        # reorder and normalizes on decode. Resolution/component flags
        # 0x20 AND 0x10 mean the i- and j-increments are given; if EITHER
        # is unset that increment field holds the all-ones missing sentinel
        # and dlat/dlon would decode as ~4.29e9 microdegrees — require both.
        gaussian_n: int | None = None
        latitudes: np.ndarray | None = None
        if tmpl_no in (10, 20, 30):
            dlat = dlon = 0  # projected grid: no affine lat/lon axes
        else:
            scan = g[57]
            if scan not in (0x00, 0x40):
                raise ValueError(
                    f"unsupported scanning mode 0x{scan:02x} (only +i,±j row-major)"
                )
            # Basic angle / subdivisions (octets 39-46): a non-default
            # unit re-scales EVERY coordinate and increment — reading a
            # millidegree-unit grid as microdegrees is 1000x silent
            # geography corruption, so only the default microdegree
            # unit decodes: basic angle 0 / coded missing, or the
            # equivalent explicit 1/10^6.
            (basic,) = struct.unpack_from(">I", g, 24)
            (subdiv,) = struct.unpack_from(">I", g, 28)
            if not (
                basic in (0, 0xFFFFFFFF)
                or (basic == 1 and subdiv == 1_000_000)
            ):
                raise ValueError(
                    f"non-default basic angle {basic}/{subdiv} not "
                    "supported (coordinates would not be microdegrees)"
                )
            # 3.0 carries BOTH increments; if either flag is unset that
            # field holds the all-ones missing sentinel and would decode as
            # ~4.29e9 microdegrees.  3.40's Dj octets hold N (always
            # meaningful), so only the i-increment flag applies there — and
            # a REDUCED grid has no common i-increment at all (Di coded
            # missing, per-row spacing 360/row_ni[j]).
            need_flags = 0x00 if row_ni is not None else (
                0x20 if tmpl_no == 40 else 0x30
            )
            if (g[40] & need_flags) != need_flags:
                raise ValueError("direction increments not given (resolution flags)")
            if row_ni is not None:
                dlon = 0
            else:
                (dlon,) = struct.unpack_from(">I", g, 49)
            if tmpl_no == 40:
                # Dj's octets hold N; only the GLOBAL grid (nj == 2N) is
                # supported — a latitude subset would need La1/La2 root
                # matching, and silently assuming global would misplace rows.
                (gaussian_n,) = struct.unpack_from(">I", g, 53)
                if scan != 0x00:
                    raise ValueError(
                        "Gaussian grids support north-first scanning only"
                    )
                if nj != 2 * gaussian_n:
                    raise ValueError(
                        f"non-global Gaussian grid (nj={nj}, N={gaussian_n}) not supported"
                    )
                latitudes = gaussian_latitudes(nj)
                dlat = 0
            else:
                (dlat,) = struct.unpack_from(">I", g, 53)
            if tmpl_no in (1, 3):
                # Templates 3.1/3.3 (ROTATED lat/lon — COSMO/HIRLAM;
                # 3.3 adds stretching): the 3.0 body's axes are
                # coordinates IN THE ROTATED SYSTEM; the southern pole
                # of projection + angle of rotation follow at octets
                # 73-84.  True per-cell coordinates come from the lazy
                # unrotation (rotated_unrotate); the affine fields stay
                # the ROTATED axes — consumers must not read them as
                # geography, which is why the landing source treats
                # these like the projected family (cell arrays, affine
                # NULL).
                if len(g) < 70:
                    raise ValueError(
                        f"truncated grid definition template 3.{tmpl_no}"
                    )
                lambert_params = {
                    "kind": "rotated",
                    "sp_lat": _rs32be(g, 58) / 1e6,
                    "sp_lon": _rs32be(g, 62) / 1e6,
                    "angle": _rs32be(g, 66) / 1e6,
                }
                if not -90.0 <= lambert_params["sp_lat"] <= 90.0:
                    raise ValueError(
                        "rotated-grid southern pole latitude out of range"
                    )
            if tmpl_no in (2, 3):
                # Templates 3.2/3.3 (STRETCHED lat/lon — the ARPEGE/
                # ALADIN Schmidt geometry): the pole of stretching
                # (µdeg) + the stretching factor ×10^6 follow the 3.0
                # body (3.2) or the rotation block (3.3).  The axes are
                # coordinates in the stretched (and rotated, for 3.3)
                # system; true per-cell coordinates come from the lazy
                # Schmidt unstretch (then unrotation, for 3.3).
                off = 70 if tmpl_no == 3 else 58
                if len(g) < off + 12:
                    raise ValueError(
                        f"truncated grid definition template 3.{tmpl_no}"
                    )
                (raw_c,) = struct.unpack_from(">I", g, off + 8)
                if raw_c in (0, 0xFFFFFFFF):
                    raise ValueError(
                        "stretching factor missing or zero"
                    )
                st = {
                    "st_lat": _rs32be(g, off) / 1e6,
                    "st_lon": _rs32be(g, off + 4) / 1e6,
                    "st_c": raw_c / 1e6,
                }
                if not -90.0 <= st["st_lat"] <= 90.0:
                    raise ValueError(
                        "pole-of-stretching latitude out of range"
                    )
                if tmpl_no == 2:
                    lambert_params = {"kind": "stretched", **st}
                else:
                    lambert_params["kind"] = "stretched_rotated"
                    lambert_params.update(st)

    s4 = s[4]
    (tmpl4,) = struct.unpack_from(">H", s4, 7)
    tmpl4_wire = tmpl4  # the template number the WIRE carries — what
    # product_template surfaces (the chemistry/aerosol remap below
    # redirects layout decoding only)
    constituent_type = None
    aerosol_type = aerosol_size_interval = None
    aerosol_first_size_m = aerosol_second_size_m = None
    aerosol_wavelength_interval = None
    aerosol_first_wavelength_m = aerosol_second_wavelength_m = None
    if tmpl4 in _CHEM_AEROSOL_BASE:
        # Chemistry (4.40-4.43) and aerosol (4.44-4.49) families — the
        # CAMS / NCEP-dust product templates wgrib2 scans through the
        # same -match path the reference shells out to
        # (/root/reference/src/file-conversions.js:76-112).  The
        # inserted block is parsed here, then _splice_chem_aerosol
        # (shared with both inventory surfaces) cuts it out so the
        # remainder decodes through the base template's exact offsets.
        if len(s4) < 13 + _chem_insert_len(tmpl4):
            raise ValueError(
                f"truncated product definition template 4.{tmpl4}"
            )
        (ctype,) = struct.unpack_from(">H", s4, 11)
        if tmpl4 <= 43:
            constituent_type = ctype if ctype != 0xFFFF else None
        else:
            aerosol_type = ctype if ctype != 0xFFFF else None
            aerosol_size_interval = s4[13] if s4[13] != 0xFF else None
            aerosol_first_size_m = _scaled_limit(s4, 14)
            aerosol_second_size_m = _scaled_limit(s4, 19)
            if tmpl4 in (48, 49):
                aerosol_wavelength_interval = (
                    s4[24] if s4[24] != 0xFF else None
                )
                aerosol_first_wavelength_m = _scaled_limit(s4, 25)
                aerosol_second_wavelength_m = _scaled_limit(s4, 30)
        s4, tmpl4 = _splice_chem_aerosol(s4, tmpl4)
    if tmpl4 not in (
        0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
        20, 30, 31, 32, 33, 34, 60, 61,
    ):
        # only templates sharing 4.0's leading layout (category/number at
        # octets 10-11, fixed surfaces at 23-34 — 4.1 ensemble member,
        # 4.2 derived forecast, 4.3/4.4 cluster-derived forecasts,
        # 4.5 probability, 4.6 percentile, 4.7 analysis/forecast
        # error (LAYOUT-identical to 4.0 — only the surfaced
        # product_template distinguishes an error field from the
        # analysis itself),
        # 4.8 statistical and their 4.11/4.12/4.13/4.14/4.9/4.10
        # statistical
        # forms extend it; plus the satellite family 4.31/4.32 and its
        # ensemble forms 4.33/4.34 (band list, no fixed surfaces) and
        # the radar template 4.20 (site-based layout), each handled on
        # its own branch below) may be read; anything else would
        # decode garbage level columns.
        raise ValueError(f"unsupported product definition template {tmpl4}")
    category, number = s4[9], s4[10]
    satellite_bands = satellite_series = satellite_numbers = None
    satellite_instruments = central_wavenumbers = None
    radar_sites = radar_site_id = radar_site_number = None
    radar_site_lat = radar_site_lon = None
    radar_elevation_m = radar_operating_mode = None
    sat_ensemble: tuple | None = None
    sat_stat_base: int | None = None
    if tmpl4 == 20:
        # RADAR template: site-based layout sharing NOTHING past the
        # parameter octets with the 4.0 family — no fixed surfaces, no
        # forecast-time octets (a radar product is an observation at
        # the reference time), the octets instead carrying the site's
        # coordinates, identifiers and operating characteristics.
        # wgrib2 decodes these through the same -match scan path the
        # reference uses (/root/reference/src/file-conversions.js:
        # 76-112).
        level_type = level_scale = level_value = None
        level2_type = level2_scale = level2_value = None
        forecast_hours = None
        if len(s4) < 43:
            raise ValueError("truncated product definition template 4.20")
        radar_sites = s4[12] if s4[12] != 0xFF else None
        # The all-ones sign-magnitude word is the coded-missing
        # sentinel for the site coordinates, like every sibling radar_*
        # field — reading it through _rs32be would decode ~-2147.48°
        # and quarantine a real product whose site metadata is simply
        # absent.  Range checks apply only to PRESENT coordinates.
        if s4[14:18] == b"\xff\xff\xff\xff":
            radar_site_lat = None
        else:
            radar_site_lat = _rs32be(s4, 14) / 1e6
            if not -90.0 <= radar_site_lat <= 90.0:
                raise ValueError(
                    f"radar site latitude {radar_site_lat} out of range"
                )
        if s4[18:22] == b"\xff\xff\xff\xff":
            radar_site_lon = None
        else:
            radar_site_lon = _rs32be(s4, 18) / 1e6
            if not -180.0 <= radar_site_lon <= 360.0:
                # same signed-magnitude pair, same loudness as latitude
                raise ValueError(
                    f"radar site longitude {radar_site_lon} out of range"
                )
        (elev,) = struct.unpack_from(">H", s4, 22)
        radar_elevation_m = elev if elev != 0xFFFF else None
        sid = s4[24:28]
        if sid != b"\xff\xff\xff\xff":
            # CCITT IA5 (ASCII) 4-character site id; a non-ASCII octet
            # is a corrupt section, not a site name
            try:
                radar_site_id = sid.decode("ascii").strip("\x00 ") or None
            except UnicodeDecodeError:
                raise ValueError(
                    "radar site id is not CCITT IA5 (ASCII)"
                ) from None
        (snum,) = struct.unpack_from(">H", s4, 28)
        radar_site_number = snum if snum != 0xFFFF else None
        radar_operating_mode = s4[30] if s4[30] != 0xFF else None
    elif tmpl4 in (30, 31, 32, 33, 34):
        # Satellite family: NO fixed surfaces (a satellite view has no
        # level — reading octets 23-34 would decode band data as level
        # columns), and 4.30/4.31 have no forecast-time octets either
        # (observations at the reference time).  4.32 (simulated
        # satellite imagery) keeps 4.0's generating-process + lead
        # block, then NB at octet 23; 4.30/4.31 have NB at octet 14
        # after the observation-generating-process identifier — 4.30
        # is the DEPRECATED form whose band block is one octet
        # narrower (1-octet instrument type), dispatched on its own
        # width in _parse_satellite_bands.  4.33/4.34 (individual
        # ensemble member for SIMULATED satellite data) share 4.32's
        # leading layout, then append the three 4.1-style ensemble
        # octets AFTER the band list — 4.34 continues with the 4.8
        # statistical block after those (the second variable-offset
        # statistical family besides 4.13/4.14).
        level_type = level_scale = level_value = None
        level2_type = level2_scale = level2_value = None
        if tmpl4 in (30, 31):
            forecast_hours = None
            nb_off = 13
        else:
            forecast_hours = _forecast_hours(s4[17], _rs32be(s4, 18))
            nb_off = 22
        (
            satellite_bands,
            satellite_series,
            satellite_numbers,
            satellite_instruments,
            central_wavenumbers,
        ) = _parse_satellite_bands(s4, nb_off, tmpl4)
        if tmpl4 in (33, 34):
            eo = nb_off + 1 + 11 * satellite_bands
            if len(s4) < eo + 3:
                raise ValueError(
                    f"truncated product definition template 4.{tmpl4}"
                )
            sat_ensemble = (
                s4[eo] if s4[eo] != 0xFF else None,
                s4[eo + 1] if s4[eo + 1] != 0xFF else None,
                s4[eo + 2] if s4[eo + 2] != 0xFF else None,
            )
            if tmpl4 == 34:
                sat_stat_base = eo + 3
    else:
        # Octets 18-22, shared by the whole 4.0 family: forecast lead
        # time (unit from code table 4.4, signed-magnitude value) —
        # GFS f000-f384 style products are distinguished ONLY by this
        # field, so a decoder ignoring it would collapse every lead
        # into the analysis.
        forecast_hours = _forecast_hours(s4[17], _rs32be(s4, 18))
        level_type, level_scale, level_value = parse_fixed_surface(s4)
        level2_type, level2_scale, level2_value = parse_second_surface(s4)
    ensemble_type = ensemble_member = ensemble_size = None
    if sat_ensemble is not None:
        # 4.33/4.34: the same three ensemble octets as 4.1/4.11, read
        # above at their band-list-relative offset
        ensemble_type, ensemble_member, ensemble_size = sat_ensemble
    derived_forecast = None
    cluster_identifier = cluster_total = cluster_method = None
    cluster_size = cluster_members = None
    cluster_stddev = cluster_mean_distance = None
    probability_number = probability_total = probability_type = None
    prob_lower_limit = prob_upper_limit = None
    percentile_value = None
    spatial_statistical_process = spatial_process_type = None
    spatial_points = None
    model_version = None
    if tmpl4 in (1, 11, 60, 61):
        # 4.1 (individual ensemble member) appends octets 35-37: type
        # of ensemble forecast (code table 4.6), perturbation number,
        # ensemble size; 4.11 continues with the 4.8 statistical block.
        # 4.60/4.61 (individual ensemble REFORECAST — GEFS v12's
        # reforecast archive form) append the MODEL VERSION DATE
        # (octets 38-44) after the ensemble octets; 4.61 continues
        # with the statistical block from octet 45.
        if len(s4) < 37:
            raise ValueError(f"truncated product definition template 4.{tmpl4}")
        ensemble_type = s4[34] if s4[34] != 0xFF else None
        ensemble_member = s4[35] if s4[35] != 0xFF else None
        ensemble_size = s4[36] if s4[36] != 0xFF else None
        if tmpl4 in (60, 61):
            if len(s4) < 44:
                raise ValueError(
                    f"truncated product definition template 4.{tmpl4}"
                )
            (mv_year,) = struct.unpack_from(">H", s4, 37)
            model_version = (mv_year, s4[39], s4[40], s4[41], s4[42])
            if not (
                1 <= s4[39] <= 12 and 1 <= s4[40] <= 31
                and s4[41] < 24 and s4[42] < 60 and s4[43] < 60
            ):
                raise ValueError(
                    f"model version date {model_version} out of range"
                )
    elif tmpl4 in (2, 12):
        # 4.2 (derived forecast from ALL ensemble members — the mean /
        # spread products ECMWF ENS and GEFS publish beside the 4.1
        # members) appends octets 35-36: derived-forecast type (code
        # table 4.7: 0 unweighted mean, 2 std dev, 4 spread, ...) and
        # the number of forecasts in the ensemble; 4.12 continues with
        # the statistical block.
        if len(s4) < 36:
            raise ValueError(f"truncated product definition template 4.{tmpl4}")
        derived_forecast = s4[34] if s4[34] != 0xFF else None
        ensemble_size = s4[35] if s4[35] != 0xFF else None
    elif tmpl4 in (3, 4, 13, 14):
        # 4.3 / 4.4 (derived forecast from a CLUSTER of ensemble
        # members over a rectangular / circular area — the cluster
        # products EPS post-processing publishes beside the 4.2
        # all-member products) and their 4.13 / 4.14 statistical
        # siblings: octets 35-36 repeat the 4.2 layout
        # (code-table-4.7 derived type, ensemble size), then the
        # cluster block — identifier (37), the clusters holding the
        # high-/low-resolution controls (38-39, validated but not
        # surfaced), total clusters (40), code-table-4.8 method (41),
        # the domain geometry (42-57 rect: N/S lat + E/W lon;
        # 42-53 circ: center lat/lon + radius — validated, not
        # surfaced), NC = forecasts in the cluster, the in-cluster
        # standard deviation and distance from the ensemble mean as
        # (scale, scaled value) pairs, and the NC member numbers.
        # On 4.13/4.14 the 4.8 statistical block follows the member
        # list — a VARIABLE offset (the only family whose statistical
        # base depends on a count field), handled below.
        nc_off = 57 if tmpl4 in (3, 13) else 53  # 0-based octet of NC
        if len(s4) < nc_off + 1:
            raise ValueError(f"truncated product definition template 4.{tmpl4}")
        derived_forecast = s4[34] if s4[34] != 0xFF else None
        ensemble_size = s4[35] if s4[35] != 0xFF else None
        cluster_identifier = s4[36] if s4[36] != 0xFF else None
        cluster_total = s4[39] if s4[39] != 0xFF else None
        cluster_method = s4[40] if s4[40] != 0xFF else None
        nc = s4[nc_off]
        if nc == 0 or nc == 0xFF:
            # without NC the member list length is unknowable — a
            # guessed length would mis-slice every following octet
            raise ValueError(
                f"product definition template 4.{tmpl4} with no "
                "forecasts in the cluster"
            )
        if len(s4) < nc_off + 11 + nc:
            raise ValueError(
                f"truncated product definition template 4.{tmpl4} "
                f"({nc} cluster members)"
            )
        cluster_size = nc
        cluster_stddev = _scaled_limit(s4, nc_off + 1)
        cluster_mean_distance = _scaled_limit(s4, nc_off + 6)
        cluster_members = tuple(s4[nc_off + 11 : nc_off + 11 + nc])
    elif tmpl4 in (5, 9):
        # 4.5 (probability forecast) appends octets 35-47: probability
        # index / total, probability type (code table 4.9: 0 below
        # lower, 1 above upper, 2 between, 3 above lower, 4 below
        # upper) and the two threshold limits as (scale factor, scaled
        # value) pairs — both signed-magnitude, either coded missing
        # when the type doesn't bound that side; 4.9 continues with the
        # statistical block.
        if len(s4) < 47:
            raise ValueError(f"truncated product definition template 4.{tmpl4}")
        probability_number = s4[34] if s4[34] != 0xFF else None
        probability_total = s4[35] if s4[35] != 0xFF else None
        probability_type = s4[36] if s4[36] != 0xFF else None
        prob_lower_limit = _scaled_limit(s4, 37)
        prob_upper_limit = _scaled_limit(s4, 42)
    elif tmpl4 in (6, 10):
        # 4.6 (percentile forecast — "the 90th-percentile
        # precipitation" products ensembles publish) appends a single
        # octet 35: the percentile (0-100); 4.10 continues with the
        # statistical block.  An out-of-range octet is a corrupt
        # section, not a bigger percentile.
        if len(s4) < 35:
            raise ValueError(f"truncated product definition template 4.{tmpl4}")
        percentile_value = s4[34] if s4[34] != 0xFF else None
        if percentile_value is not None and percentile_value > 100:
            raise ValueError(
                f"percentile value {percentile_value} out of range 0-100"
            )
    elif tmpl4 == 15:
        # 4.15 (spatio-statistical processing — smoothed / re-gridded
        # products) appends octets 35-37: the statistical process used
        # WITHIN the spatial area (code table 4.10), the spatial
        # processing type (code table 4.15) and the number of data
        # points used.  This is an AREA statistic, not a time
        # interval: statistical_process / interval_end stay None.
        if len(s4) < 37:
            raise ValueError("truncated product definition template 4.15")
        spatial_statistical_process = s4[34] if s4[34] != 0xFF else None
        spatial_process_type = s4[35] if s4[35] != 0xFF else None
        spatial_points = s4[36] if s4[36] != 0xFF else None
    statistical_process = None
    interval_end = None
    time_range_count = None
    # statistical block start: octet 35 (4.8), 38 (4.11, after the
    # three ensemble octets), 37 (4.12, after the two derived-forecast
    # octets), 48 (4.9, after the thirteen probability octets) or 36
    # (4.10, after the one percentile octet) — a parser reusing 4.8's
    # offset on the extended forms would decode a garbage interval end.
    # 4.13/4.14 and 4.34 are the VARIABLE-offset forms: their block
    # follows the NC-long member list / NB-long band list.
    stat_base = {8: 34, 11: 37, 12: 36, 9: 47, 10: 35, 61: 44}.get(tmpl4)
    if tmpl4 in (13, 14):
        stat_base = (57 if tmpl4 == 13 else 53) + 11 + cluster_size
    if tmpl4 == 34:
        # the other variable-offset statistical family: the block
        # follows the NB-long band list and the three ensemble octets
        stat_base = sat_stat_base
    if stat_base is not None:
        base = stat_base
        if len(s4) < base + 24:  # the 24-octet single-spec extension
            raise ValueError(f"truncated product definition template 4.{tmpl4}")
        (end_year,) = struct.unpack_from(">H", s4, base)
        interval_end = (
            end_year, s4[base + 2], s4[base + 3], s4[base + 4], s4[base + 5]
        )
        # number of time-range specifications: n > 1 nests statistics
        # ("average of DAILY MAXIMA"); only the FIRST (outermost) spec
        # is surfaced as statistical_process, so n must ride along —
        # without it a compound statistic would masquerade as a plain
        # one.  n = 0 / coded-missing is spec-invalid.
        n_ranges = s4[base + 7]
        if n_ranges == 0 or n_ranges == 0xFF:
            raise ValueError(
                f"product definition template 4.{tmpl4} with "
                "no time-range specifications"
            )
        if len(s4) < base + 12 + 12 * n_ranges:
            raise ValueError(
                f"truncated product definition template 4.{tmpl4} "
                f"({n_ranges} time-range specifications)"
            )
        time_range_count = n_ranges
        statistical_process = (
            s4[base + 12] if s4[base + 12] != 0xFF else None
        )

    s5 = s[5]
    (tmpl5,) = struct.unpack_from(">H", s5, 9)
    if tmpl5 not in (0, 2, 3, 4, 40, 41, 42, 50, 51, 61, 200):
        raise ValueError(f"unsupported data representation template {tmpl5}")
    # Spectral grid ↔ spectral packing must pair: 5.50/5.51's value
    # sequence only means anything against 3.50's coefficient ordering,
    # and a gridded raster packed "as spectral" (or vice versa) would
    # decode a garbage field with plausible statistics.
    if (tmpl5 in (50, 51)) != (spectral_truncation is not None):
        raise ValueError(
            f"grid definition template {tmpl_no} cannot pair with data "
            f"representation template {tmpl5}"
        )
    (n_present,) = struct.unpack_from(">I", s5, 5)
    ieee_precision = None
    if tmpl5 == 4:
        # Template 5.4 (IEEE floating-point data): NO reference value,
        # scales or width octets — octet 12 is the precision (code
        # table 5.7).  Reading the 5.0 layout here would decode float
        # bytes as R/E/D and mis-slice section 7.
        if len(s5) < 12:
            raise ValueError("truncated data representation template 5.4")
        ieee_precision = s5[11]
        if ieee_precision not in (1, 2):
            raise ValueError(
                f"unsupported IEEE precision {ieee_precision} "
                "(code table 5.7: 1 = binary32, 2 = binary64)"
            )
        r = 0.0
        binary_scale = decimal_scale = 0
        nbits = 32 * ieee_precision
    elif tmpl5 == 200:
        # Template 5.200 (run length with level values — JMA radar
        # composites): NO reference value or binary scale — octet 12
        # is the code width, 13-14 MV (highest level used), 15-16 MVL
        # (table size), 17 the one-octet signed-magnitude decimal
        # scale, then the MVL 2-octet scaled representative values.
        # Reading the 5.0 layout here would decode the table as R/E/D.
        if len(s5) < 17:
            raise ValueError("truncated data representation template 5.200")
        nbits = s5[11]
        (rle_mv,) = struct.unpack_from(">H", s5, 12)
        (rle_mvl,) = struct.unpack_from(">H", s5, 14)
        if not 1 <= nbits <= 16:
            raise ValueError(
                f"run-length code width {nbits} out of range 1-16"
            )
        # MV is the highest level THIS FIELD uses (codes above it are
        # run digits); the table may define more levels than the field
        # touches, so MVL >= MV is the usual shape — but a level the
        # table can't resolve is checked after the stream decodes.
        if rle_mv > (1 << nbits) - 1:
            raise ValueError(
                f"MV={rle_mv} does not fit {nbits}-bit codes"
            )
        decimal_scale = (
            -(s5[16] & 0x7F) if s5[16] & 0x80 else s5[16]
        )
        if len(s5) < 17 + 2 * rle_mvl:
            raise ValueError("truncated run-length level table")
        rle_table = np.frombuffer(
            s5, dtype=">u2", count=rle_mvl, offset=17
        ).astype(np.float64)
        r = 0.0
        binary_scale = 0
    else:
        (r,) = struct.unpack_from(">f", s5, 11)
        binary_scale = _rs16be(s5, 15)
        decimal_scale = _rs16be(s5, 17)
        nbits = s5[19]

    s6 = s[6]
    if len(s6) < 6:
        # _sections only requires length >= 5; a 5-byte section 6 has no
        # bitmap-indicator octet — the same guard _iter_field_sections
        # applies, so both decode paths fail uniformly and loudly
        raise ValueError("malformed section 6 (no bitmap indicator octet)")
    if spectral_truncation is not None:
        # 2·pairs REAL values (re/im interleaved); spectral data has no
        # cells for a bitmap to mask
        total_cells = 2 * nj
        if s6[5] != 255:
            raise ValueError(
                f"spectral data carries no bitmap (indicator {s6[5]})"
            )
    else:
        total_cells = int(row_ni.sum()) if row_ni is not None else ni * nj
    bitmap = None
    if s6[5] == 0:
        bits = np.unpackbits(np.frombuffer(s6[6:], dtype=np.uint8))[:total_cells]
        if bits.size < total_cells:
            # a too-short bitmap (e.g. indicator-254 reuse across fields
            # on different grids) must stop, not silently mask a prefix
            raise ValueError(
                f"bitmap holds {bits.size} bits, grid has {total_cells} cells"
            )
        bitmap = bits.astype(bool)
    elif s6[5] != 255:
        raise ValueError(f"unsupported bitmap indicator {s6[5]}")
    if bitmap is not None and tmpl5 == 200:
        # 5.200 carries its missing cells as level 0 — a bitmap on top
        # is outside the JMA convention, and guessing the composition
        # order would be silent corruption
        raise ValueError(
            "run-length packing (5.200) carries missing cells as "
            "level 0, not a bitmap"
        )

    s7 = s[7]
    spectral_sub: int | None = None
    if tmpl5 == 51:
        # Template 5.51/7.51 (COMPLEX spectral packing — the
        # operational IFS/ERA5 form): the n <= TS sub-spectrum rides
        # UNPACKED as IEEE-32 floats at the head of section 7; every
        # other value was multiplied by the Laplacian weight
        # (n(n+1))^p before simple packing, so decode divides it back
        # out.  Octets 21-24: p ×10^6 signed-magnitude; 25-30:
        # JS/KS/MS (triangular TS here); 31: precision of the
        # unpacked subset (code table 5.7; only 1 = IEEE 32-bit).
        if len(s5) < 31:
            raise ValueError("truncated data representation template 5.51")
        lap_p = _rs32be(s5, 20) / 1e6
        (sub_j,) = struct.unpack_from(">H", s5, 24)
        (sub_k,) = struct.unpack_from(">H", s5, 26)
        (sub_m,) = struct.unpack_from(">H", s5, 28)
        if not (sub_j == sub_k == sub_m) or sub_j >= spectral_truncation:
            raise ValueError(
                f"only triangular sub-truncation below T supported "
                f"(JS={sub_j}, KS={sub_k}, MS={sub_m}, "
                f"T={spectral_truncation})"
            )
        if s5[30] != 1:
            raise ValueError(
                f"unsupported unpacked-subset precision {s5[30]} "
                "(only IEEE 32-bit)"
            )
        spectral_sub = int(sub_j)
        deg2 = _spectral_degrees(spectral_truncation)
        sub = deg2 <= sub_j
        n_sub = int(sub.sum())
        if n_present != total_cells - n_sub:
            raise ValueError(
                f"TS={sub_j} sub-spectrum leaves {total_cells - n_sub} "
                f"packed values, section 5 declares {n_present}"
            )
        if len(s7) < 5 + 4 * n_sub:
            raise ValueError("truncated spectral sub-spectrum in section 7")
        unpacked = np.frombuffer(
            s7, dtype=">f4", count=n_sub, offset=5
        ).astype(np.float64)
        if nbits:
            x = _unpack_bits(s7[5 + 4 * n_sub :], n_present, nbits)
            rest = (
                float(r) + x.astype(np.float64) * (2.0 ** binary_scale)
            ) / (10.0 ** decimal_scale)
        else:
            rest = np.full(n_present, float(r) / (10.0 ** decimal_scale))
        dn = deg2[~sub].astype(np.float64)
        present_vals = np.empty(total_cells)
        present_vals[sub] = unpacked
        present_vals[~sub] = rest * (dn * (dn + 1.0)) ** (-lap_p)
    elif tmpl5 == 50:
        # Template 5.50/7.50 (spectral data simple packing): the (0,0)
        # real coefficient rides UNPACKED as an IEEE-32 float in the
        # template (octets 21-24); every other value of the mode-1
        # sequence simple-packs in section 7.
        if len(s5) < 24:
            raise ValueError("truncated data representation template 5.50")
        if n_present != total_cells - 1:
            raise ValueError(
                f"T{spectral_truncation} spectrum packs {total_cells - 1} "
                f"values, section 5 declares {n_present}"
            )
        (re00,) = struct.unpack_from(">f", s5, 20)
        if nbits:
            x = _unpack_bits(s7[5:], n_present, nbits)
            rest = (
                float(r) + x.astype(np.float64) * (2.0 ** binary_scale)
            ) / (10.0 ** decimal_scale)
        else:
            rest = np.full(n_present, float(r) / (10.0 ** decimal_scale))
        present_vals = np.concatenate(([float(re00)], rest))
    elif tmpl5 == 0:
        if nbits:
            x = _unpack_bits(s7[5:], n_present, nbits)
            present_vals = (
                float(r) + x.astype(np.float64) * (2.0 ** binary_scale)
            ) / (10.0 ** decimal_scale)
        else:
            present_vals = np.full(n_present, float(r) / (10.0 ** decimal_scale))
    elif tmpl5 == 42:
        # Template 5.42 (CCSDS 121.0 / AEC — the lossless Rice coding
        # NCEP adopted for operational GFS output; grid/aec.py is the
        # from-scratch codec): octet 21 the CCSDS flags mask, 22 the
        # block size, 23-24 the reference sample interval.
        from .aec import aec_decode

        if len(s5) < 24:
            raise ValueError("truncated data representation template 5.42")
        aec_flags, aec_block = s5[20], s5[21]
        (aec_rsi,) = struct.unpack_from(">H", s5, 22)
        if nbits == 0:  # constant field: empty stream, value is R/10^D
            present_vals = np.full(
                n_present, float(r) / (10.0 ** decimal_scale)
            )
        else:
            x = aec_decode(
                bytes(s7[5:]), n_present, nbits,
                flags=aec_flags, block_size=aec_block, rsi=aec_rsi,
            )
            present_vals = (
                float(r) + x.astype(np.float64) * (2.0 ** binary_scale)
            ) / (10.0 ** decimal_scale)
    elif tmpl5 == 61:
        # Template 5.61 (simple packing with LOGARITHM PRE-PROCESSING
        # — ECMWF precipitation-style products whose dynamic range
        # spans decades): Z = ln(Y + B) simple-packs; octets 21-24
        # carry the pre-processing parameter B (IEEE-32).  Decode
        # inverts: Y = exp((R + X·2^E)/10^D) − B.
        if len(s5) < 24:
            raise ValueError("truncated data representation template 5.61")
        (log_b,) = struct.unpack_from(">f", s5, 20)
        if nbits:
            x = _unpack_bits(s7[5:], n_present, nbits)
            z = (
                float(r) + x.astype(np.float64) * (2.0 ** binary_scale)
            ) / (10.0 ** decimal_scale)
        else:
            z = np.full(n_present, float(r) / (10.0 ** decimal_scale))
        present_vals = np.exp(z) - float(log_b)
    elif tmpl5 == 4:
        width = 4 * ieee_precision
        if len(s7) < 5 + width * n_present:
            raise ValueError("truncated IEEE floating-point data section")
        present_vals = np.frombuffer(
            s7,
            dtype=">f4" if ieee_precision == 1 else ">f8",
            count=n_present,
            offset=5,
        ).astype(np.float64)
    elif tmpl5 == 200:
        # the whole stream is nbits-wide codes; trailing byte-padding
        # forms at most floor(7/nbits) phantom zero codes, which
        # _rle_unpack accepts only as padding
        n_codes = (len(s7) - 5) * 8 // nbits
        codes = _unpack_bits(s7[5:], n_codes, nbits)
        levels = _rle_unpack(codes, nbits, rle_mv, total_cells)
        if int(levels.max(initial=0)) > rle_mvl:
            raise ValueError(
                f"run-length level {int(levels.max())} exceeds the "
                f"{rle_mvl}-entry table"
            )
        present_vals = np.full(total_cells, np.nan)
        nz = levels > 0
        present_vals[nz] = rle_table[levels[nz] - 1] / (
            10.0 ** decimal_scale
        )
        if n_present != total_cells:
            raise ValueError(
                f"section 5 declares {n_present} points, the "
                f"run-length grid has {total_cells}"
            )
    elif tmpl5 == 41:
        from .png import png_decode

        if nbits == 0:  # constant field: empty raster, value is R/10^D
            present_vals = np.full(n_present, float(r) / (10.0 ** decimal_scale))
            samples = None
        else:
            samples, _ = png_decode(bytes(s7[5:]))
        if samples is not None:
            x = samples.reshape(-1)
            if len(x) != n_present:
                raise ValueError(
                    f"PNG raster holds {len(x)} samples, expected {n_present}"
                )
            present_vals = (
                float(r) + x.astype(np.float64) * (2.0 ** binary_scale)
            ) / (10.0 ** decimal_scale)
    elif tmpl5 == 40:
        from .jpeg2000 import j2k_decode

        if s5[21] != 0:
            raise ValueError(
                f"lossy JPEG2000 compression type {s5[21]} not supported"
            )
        if nbits == 0:
            present_vals = np.full(n_present, float(r) / (10.0 ** decimal_scale))
        else:
            samples, _depth = j2k_decode(bytes(s7[5:]))
            x = samples.reshape(-1)
            if len(x) != n_present:
                raise ValueError(
                    f"JPEG2000 raster holds {len(x)} samples, expected {n_present}"
                )
            present_vals = (
                float(r) + x.astype(np.float64) * (2.0 ** binary_scale)
            ) / (10.0 ** decimal_scale)
    else:
        x, miss, miss2 = _decode_complex_s7(s5, s7, tmpl5, n_present)
        present_vals = (
            float(r) + x.astype(np.float64) * (2.0 ** binary_scale)
        ) / (10.0 ** decimal_scale)
        present_vals[miss] = np.nan
        if miss2.any():
            # SECONDARY missing (mvm=2): the producer's declared
            # substitute (section 5 octets 28-31) is what those points
            # MEAN (e.g. "below detection threshold" radar returns) —
            # landing it preserves information NaN would destroy;
            # a coded-missing substitute falls back to NaN like the
            # primary kind.
            sub2_raw = s5[27:31]
            present_vals[miss2] = (
                np.nan
                if sub2_raw == b"\xff\xff\xff\xff"
                else struct.unpack(">f", sub2_raw)[0]
            )

    if bitmap is not None:
        values = np.full(total_cells, np.nan)
        values[bitmap] = present_vals
    else:
        values = present_vals
    if row_ni is None and spectral_truncation is None:
        values = values.reshape(nj, ni)
    elif len(values) != total_cells:
        raise ValueError(
            f"{'spectrum' if spectral_truncation is not None else 'reduced grid'}"
            f" holds {len(values)} values, expected {total_cells}"
        )
    if scan == 0x40 and tmpl_no not in (10, 20, 30):
        # south-first storage → normalize to north-first (lat/lon grids
        # only; projected grids keep storage order — their per-cell
        # coordinate arrays already reflect the scan direction)
        values = values[::-1]
        lat_first = lat_first + (nj - 1) * dlat  # La1 was the southern edge
    return Grib2Record(
        discipline=discipline,
        category=category,
        number=number,
        reftime=reftime,
        ni=ni,
        nj=nj,
        lat_first_udeg=lat_first,
        lon_first_udeg=lon_first,
        dlat_udeg=dlat,
        dlon_udeg=dlon,
        decimal_scale=decimal_scale,
        binary_scale=binary_scale,
        reference_value=float(r),
        nbits=nbits,
        values=values,
        level_type=level_type,
        level_scale=level_scale,
        level_value=level_value,
        level2_type=level2_type,
        level2_scale=level2_scale,
        level2_value=level2_value,
        packing_template=tmpl5,
        gaussian_n=gaussian_n,
        latitudes_deg=latitudes,
        grid_template=tmpl_no,
        lambert_params=lambert_params,
        statistical_process=statistical_process,
        interval_end=interval_end,
        ensemble_type=ensemble_type,
        ensemble_member=ensemble_member,
        ensemble_size=ensemble_size,
        product_template=tmpl4_wire,
        model_version=model_version,
        constituent_type=constituent_type,
        aerosol_type=aerosol_type,
        aerosol_size_interval=aerosol_size_interval,
        aerosol_first_size_m=aerosol_first_size_m,
        aerosol_second_size_m=aerosol_second_size_m,
        aerosol_wavelength_interval=aerosol_wavelength_interval,
        aerosol_first_wavelength_m=aerosol_first_wavelength_m,
        aerosol_second_wavelength_m=aerosol_second_wavelength_m,
        derived_forecast=derived_forecast,
        cluster_identifier=cluster_identifier,
        cluster_total=cluster_total,
        cluster_method=cluster_method,
        cluster_size=cluster_size,
        cluster_members=cluster_members,
        cluster_stddev=cluster_stddev,
        cluster_mean_distance=cluster_mean_distance,
        probability_number=probability_number,
        probability_total=probability_total,
        probability_type=probability_type,
        prob_lower_limit=prob_lower_limit,
        prob_upper_limit=prob_upper_limit,
        percentile_value=percentile_value,
        satellite_bands=satellite_bands,
        satellite_series=satellite_series,
        satellite_numbers=satellite_numbers,
        satellite_instruments=satellite_instruments,
        central_wavenumbers=central_wavenumbers,
        radar_sites=radar_sites,
        radar_site_id=radar_site_id,
        radar_site_number=radar_site_number,
        radar_site_lat=radar_site_lat,
        radar_site_lon=radar_site_lon,
        radar_elevation_m=radar_elevation_m,
        radar_operating_mode=radar_operating_mode,
        forecast_hours=forecast_hours,
        time_range_count=time_range_count,
        row_ni=row_ni,
        spectral_truncation=spectral_truncation,
        spectral_sub_truncation=spectral_sub,
        spatial_statistical_process=spatial_statistical_process,
        spatial_process_type=spatial_process_type,
        spatial_points=spatial_points,
    )


def _field_inventory(s: dict[int, bytes]) -> str:
    """wgrib2-style inventory rendering of one FIELD's resolved section
    dict: ``d{discipline}:c{category},n{number}:l{level_type}/{level}
    [-{level2}]:{YYYYMMDDHH}:f{lead hours}`` — a stable engine-defined
    rendering of the same fields wgrib2 prints.  Its ``:anl:`` /
    ``:6 hour fcst:`` selector is the trailing ``:f0`` / ``:f6``; its
    LEVEL string (the field the reference's wgrib2 -match regexes key
    on, /root/reference/src/file-conversions.js:79-87 — "0-10 cm
    down", "500 mb") is the ``l{type}/{level}`` field, rendered
    exactly like the landing scan's unified line (sources/grib_source.
    inventory_line) so one level/layer regex works on both surfaces.
    A missing surface renders ``-``; a non-hour-convertible lead
    (calendar units) renders ``f-`` — LISTED, like wgrib2 lists every
    record, but never selected by an ``:f6$``-style match."""
    s1, s4 = s[1], s[4]
    (year,) = struct.unpack_from(">H", s1, 12)
    (tmpl4,) = struct.unpack_from(">H", s4, 7)
    if tmpl4 in _CHEM_AEROSOL_BASE:
        # chemistry/aerosol family: the SHARED splice redirects level +
        # lead rendering through the base-template offsets
        s4, tmpl4 = _splice_chem_aerosol(s4, tmpl4)
    if tmpl4 not in (
        0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
        20, 30, 31, 32, 33, 34, 60, 61,
    ):
        # same gate as the decode and the landing inventory: rendering
        # a layout-divergent template through the family offsets would
        # print band/site octets as a fake level — the surfaces must
        # never disagree
        raise ValueError(f"unsupported product definition template {tmpl4}")
    if tmpl4 in (20, 30, 31, 32, 33, 34):
        # Satellite family (incl. the ensemble 4.33/4.34) and radar:
        # no fixed surfaces (octets 23+ carry the band list / site
        # block, not levels) — reading them through the family layout
        # would render band data as a level.  4.31 and 4.20 also have
        # no lead octets; 4.32/4.33/4.34 keep the family lead block.
        lt = None
        lvs = "-"
        if tmpl4 in (32, 33, 34):
            try:
                fh: int | str = _forecast_hours(s4[17], _rs32be(s4, 18))
            except ValueError:
                fh = "-"
        else:
            fh = "-"
    else:
        lt, sc, lv = parse_fixed_surface(s4)
        lt2, sc2, lv2 = parse_second_surface(s4)
        # lenient TEXT rendering: fractional surfaces (sigma 0.995)
        # list as their exact decimal instead of aborting the
        # inventory — the loud stop lives in the decode path
        # (surface_level)
        lvs = surface_level_text(lv, sc)
        if lv2 is not None:
            lvs = f"{lvs}-{surface_level_text(lv2, sc2)}"
        try:
            fh = _forecast_hours(s4[17], _rs32be(s4, 18))
        except ValueError:
            fh = "-"
    return (
        f"d{s[0][6]}:c{s4[9]},n{s4[10]}:"
        f"l{'-' if lt is None else lt}/{lvs}:"
        f"{year:04d}{s1[14]:02d}{s1[15]:02d}{s1[16]:02d}"
        f":f{fh}"
    )


@loud_truncation
def inventory_lines(msg: bytes) -> list[str]:
    """wgrib2-style inventory, one line per FIELD in message order —
    wgrib2 itself inventories submessages (its N.M numbering), so a
    multi-field NDFD-style message yields several lines, matching the
    per-field rows the landing scan lands."""
    return [_field_inventory(s) for s in _iter_field_sections(msg)]


@loud_truncation
def inventory_line(msg: bytes) -> str:
    """Single-field form of :func:`inventory_lines`: the one inventory
    line of a SINGLE-FIELD message; multi-field messages raise (their
    several fields have several lines — collapsing to one would hide
    all but one field from a ``-match`` regex)."""
    if msg[:4] != MAGIC or msg[7] != EDITION:
        raise ValueError("not a GRIB edition-2 message")
    lines = inventory_lines(msg)
    if len(lines) != 1:
        raise ValueError(
            f"multi-field GRIB2 message has {len(lines)} inventory lines "
            "— use inventory_lines"
        )
    return lines[0]


@loud_truncation
def match_records(buf: bytes, pattern: str, limit: int | None = None) -> list[bytes]:
    """``wgrib2 input -match <regex> [-limit n]`` parity
    (/root/reference/src/file-conversions.js:75-99): every message ANY
    of whose per-field inventory lines matches ``pattern`` (regex
    search), in file order, capped at ``limit`` when given.  Like
    wgrib2, matching runs per FIELD on submessage archives; selection
    granularity here is the containing MESSAGE (the byte unit this
    helper deals in) — the landing scan's ``match=`` pushdown is the
    true per-field filter."""
    rx = re.compile(pattern)
    out: list[bytes] = []
    if limit is not None and limit <= 0:
        return out  # wgrib2 -limit 0 selects nothing
    for msg in iter_messages2(buf):
        if any(rx.search(line) for line in inventory_lines(msg)):
            out.append(msg)
            if limit is not None and len(out) >= limit:
                break
    return out
