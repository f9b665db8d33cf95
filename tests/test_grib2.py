"""GRIB2 codec (grid/grib2.py): encode→decode round-trips, IEEE
reference values, bitmap masking, signed-magnitude microdegree
coordinates, inventory rendering, and wgrib2 -match/-limit parity."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from monitoring_data_ingestion_spark.grid.grib2 import (
    decode_grib2,
    encode_grib2_message,
    inventory_line,
    iter_messages2,
    match_records,
)


def test_integer_grid_roundtrips_bit_exactly():
    rng = np.random.default_rng(13)
    v = rng.integers(0, 4000, size=(7, 11)).astype(np.float64)
    rec = decode_grib2(encode_grib2_message(v, nbits=12))
    assert np.array_equal(rec.values, v)


@settings(max_examples=40, deadline=None)
@given(
    nj=st.integers(2, 8),
    ni=st.integers(2, 10),
    d_scale=st.integers(-1, 2),
    e_scale=st.integers(0, 4),
    seed=st.integers(0, 2**31),
)
def test_simple_packing_error_bound(nj, ni, d_scale, e_scale, seed):
    """Same quantization bound as GRIB1 simple packing, but the IEEE
    binary32 reference only adds ≤ 2^-24 relative error (vs IBM 2^-20)."""
    rng = np.random.default_rng(seed)
    v = rng.uniform(-5000, 5000, size=(nj, ni))
    rec = decode_grib2(
        encode_grib2_message(v, decimal_scale=d_scale, binary_scale=e_scale, nbits=20)
    )
    bound = (2.0 ** (e_scale - 1)) / (10.0 ** d_scale) + 2**-20 * np.abs(v).max()
    assert np.abs(rec.values - v).max() <= bound
    assert rec.binary_scale == e_scale and rec.decimal_scale == d_scale


def test_bitmap_masks_exactly_the_declared_cells():
    rng = np.random.default_rng(5)
    v = rng.integers(0, 250, size=(6, 9)).astype(np.float64)
    bm = (np.add.outer(np.arange(6), np.arange(9)) % 4) != 0
    rec = decode_grib2(encode_grib2_message(v, bitmap=bm, nbits=8))
    assert np.isnan(rec.values[~bm]).all()
    assert np.array_equal(rec.values[bm], v[bm])


def test_header_metadata_roundtrip_incl_negative_coords():
    rec = decode_grib2(
        encode_grib2_message(
            np.zeros((3, 4)),
            discipline=2,
            category=7,
            number=192,
            reftime=(2023, 11, 30, 18, 45),
            lat_first_udeg=-35_500_000,
            lon_first_udeg=140_250_000,
            dlat_udeg=250_000,
            dlon_udeg=500_000,
            reference_value=0.0,
        )
    )
    assert (rec.discipline, rec.category, rec.number) == (2, 7, 192)
    assert rec.reftime == (2023, 11, 30, 18, 45)  # full 16-bit year field
    assert (rec.lat_first_udeg, rec.lon_first_udeg) == (-35_500_000, 140_250_000)
    assert (rec.dlat_udeg, rec.dlon_udeg) == (250_000, 500_000)
    assert (rec.ni, rec.nj) == (4, 3)


def test_ieee_reference_is_exact_for_representable_values():
    """GRIB2's float32 reference: values exactly representable in
    binary32 (0.5, small ints) round-trip bit-exactly with nbits=0."""
    for r in (0.5, 17.0, -3.25, 0.0):
        rec = decode_grib2(
            encode_grib2_message(np.full((2, 2), r), reference_value=r, nbits=0)
        )
        assert np.array_equal(rec.values, np.full((2, 2), r)), r


def _archive():
    return [
        encode_grib2_message(
            np.full((2, 3), float(10 * k)),
            category=k % 2,
            number=k,
            reference_value=0.0,
            nbits=8,
        )
        for k in range(6)
    ]


def test_inventory_line_fields():
    msgs = _archive()
    assert inventory_line(msgs[3]) == "d0:c1,n3:2020010100"


def test_match_records_regex_and_limit_parity():
    """-match selects by regex over the inventory line in file order;
    -limit caps the count — the reference's exact extraction contract
    (/root/reference/src/file-conversions.js:75-99)."""
    msgs = _archive()
    buf = b"".join(msgs)
    assert len(list(iter_messages2(buf))) == 6
    got = match_records(buf, r"c1,")
    assert [decode_grib2(m).number for m in got] == [1, 3, 5]
    assert match_records(buf, r"c1,", limit=2) == [msgs[1], msgs[3]]
    assert match_records(buf, r"n4:") == [msgs[4]]
    assert match_records(buf, r"^d0:") == msgs  # anchored match, all records
    assert match_records(buf, r"c9") == []


def test_selected_record_is_standalone_decodable():
    msgs = _archive()
    buf = b"".join(msgs)
    (m,) = match_records(buf, r"n2:")
    rec = decode_grib2(m)
    assert np.array_equal(rec.values, np.full((2, 3), 20.0))


def test_malformed_inputs_raise():
    good = encode_grib2_message(np.ones((2, 2)), reference_value=0.0)
    with pytest.raises(ValueError):
        list(iter_messages2(good[:-2]))  # truncated terminator
    with pytest.raises(ValueError):
        decode_grib2(b"NOPE" + good[4:])
    bad_edition = good[:7] + bytes([1]) + good[8:]
    with pytest.raises(ValueError):
        list(iter_messages2(bad_edition))
    with pytest.raises(ValueError):  # R above a data value → negative X
        encode_grib2_message(np.ones((2, 2)), reference_value=100.0)
    with pytest.raises(ValueError):  # increments overflow nbits
        encode_grib2_message(np.array([[0.0, 300.0]]), nbits=8, reference_value=0.0)


def test_grib1_grib2_same_field_same_values():
    """The two codecs implement the same packing formula: a field
    encoded through each edition decodes to identical values (GRIB1's
    IBM reference is exact for the integer R used here)."""
    from monitoring_data_ingestion_spark.grid.grib1 import (
        decode_grib1,
        encode_grib1_message,
    )

    rng = np.random.default_rng(31)
    v = (100 + 2 * rng.integers(0, 100, size=(5, 8))).astype(np.float64)
    r1 = decode_grib1(
        encode_grib1_message(v, reference_value=100.0, binary_scale=1, nbits=8)
    )
    r2 = decode_grib2(
        encode_grib2_message(v, reference_value=100.0, binary_scale=1, nbits=8)
    )
    assert np.array_equal(r1.values, r2.values)
    assert np.array_equal(r1.values, v)


def test_min_reference_floor_rounding_no_spurious_failure():
    """r7 review: float32 round-to-nearest of the data minimum could
    round up past it; the stored reference must floor (nextafter)."""
    v = np.array([[16777219.0, 16777300.0]])
    rec = decode_grib2(encode_grib2_message(v, nbits=16))  # was: ValueError
    assert rec.values.shape == (1, 2)
    assert np.abs(rec.values - v).max() <= 0.5 + 2**-20 * v.max()


def test_nan_without_bitmap_is_rejected():
    v = np.array([[1.0, np.nan]])
    with pytest.raises(ValueError, match="bitmap"):
        encode_grib2_message(v)
    rec = decode_grib2(
        encode_grib2_message(v, bitmap=~np.isnan(v), nbits=8, reference_value=0.0)
    )
    assert rec.values[0, 0] == 1.0 and np.isnan(rec.values[0, 1])


def test_repeated_sections_rejected_not_collapsed():
    """r7 review: GRIB2 legally repeats sections 4-7 for multi-field
    messages; collapsing to the last field would silently mis-inventory
    and mis-decode. Unsupported → loud."""
    m = encode_grib2_message(np.ones((2, 2)), reference_value=0.0)
    # Graft a second copy of sections 4..7 before the terminator.
    import struct as _s

    pos, secs = 16, {}
    while pos < len(m) - 4:
        ln, num = _s.unpack_from(">IB", m, pos)
        secs[num] = (pos, ln)
        pos += ln
    start = secs[4][0]
    end = secs[7][0] + secs[7][1]
    doubled = m[:end] + m[start:end] + m[end:]
    # Patch section-0 total length (64-bit at offset 8).
    doubled = doubled[:8] + _s.pack(">Q", len(doubled)) + doubled[16:]
    with pytest.raises(ValueError, match="repeated section"):
        decode_grib2(doubled)
    with pytest.raises(ValueError, match="repeated section"):
        inventory_line(doubled)


def test_zero_length_section_raises_not_hangs():
    m = encode_grib2_message(np.ones((2, 2)), reference_value=0.0)
    bad = m[:16] + b"\x00\x00\x00\x00\x01" + m[21:]
    with pytest.raises(ValueError, match="malformed section"):
        decode_grib2(bad)


def test_unsupported_scanning_mode_rejected():
    import struct as _s

    m = encode_grib2_message(np.ones((2, 3)), reference_value=0.0)
    pos = 16
    while True:
        ln, num = _s.unpack_from(">IB", m, pos)
        if num == 3:
            break
        pos += ln
    scan_off = pos + 14 + 57  # section header+tmpl-number → template octet 57
    bad = m[:scan_off] + bytes([0x40]) + m[scan_off + 1 :]
    with pytest.raises(ValueError, match="scanning mode"):
        decode_grib2(bad)
