"""MP3 count1 + requantization units (r12, VERDICT r11 item 6): the
quad Huffman tables, boundary fail-closure, and the requantization
paths the oracle query deliberately leaves out (preflag/pretab bands,
the |is|^(4/3) power law, half-integer scalefac_scale=0 exponents)."""

from __future__ import annotations

import pytest

from fintech_lakehouse_spark.functions.multimodal import (
    _MP3_COUNT1_A,
    _MP3_LONG_SFB,
    _MP3_PRETAB,
    mp3_requantize,
    read_mp3_granule,
    synthesize_mp3_spectrum,
)


def test_count1_table_a_is_complete_prefix_code():
    # Kraft sum exactly 1 AND no code is a prefix of another
    assert sum(2.0 ** -l for l, _ in _MP3_COUNT1_A.values()) == 1.0
    codes = {
        format(code, f"0{length}b")
        for length, code in _MP3_COUNT1_A.values()
    }
    assert len(codes) == 16
    for a in codes:
        for b in codes:
            if a is not b and b.startswith(a):
                pytest.fail(f"{a} is a prefix of {b}")


@pytest.mark.parametrize("table", [0, 1])
def test_count1_roundtrip_all_sixteen_quads(table):
    """Every quad value through both count1 tables, with signs."""
    quads = []
    for qv in range(16):
        quad = [(qv >> (3 - j)) & 1 for j in range(4)]
        quads.extend(-v if v and qv % 2 else v for v in quad)
    payload = synthesize_mp3_spectrum(
        [], count1_values=quads, count1table=table
    )
    g = read_mp3_granule(payload)
    assert g is not None
    assert g["values"] == []
    assert g["count1_values"] == quads
    assert g["count1table"] == table


def test_count1_after_bigvalues_and_boundary_failclosed():
    bvals = [1, -1, 0, 1]
    c1 = [1, 0, -1, 1]
    payload = synthesize_mp3_spectrum(bvals, count1_values=c1)
    g = read_mp3_granule(payload)
    assert g["values"] == bvals and g["count1_values"] == c1
    # desync part2_3_length vs the coded payload: flip its lowest bit
    # (side-info bits 18..29; bit 29 sits in side byte 3 at mask 0x04)
    # — a quad now straddles the boundary and the decoder must
    # QUARANTINE, not guess
    corrupt = bytearray(payload)
    corrupt[4 + 3] ^= 0x04
    assert read_mp3_granule(bytes(corrupt)) is None
    # and a corrupted big_values count (bit 31 → low region) too
    corrupt2 = bytearray(payload)
    corrupt2[4 + 3] ^= 0x01
    assert read_mp3_granule(bytes(corrupt2)) is None


def test_requantize_global_gain_and_scalefactor_exponents():
    payload = synthesize_mp3_spectrum(
        [1, 1], scalefac_compress=10,
        scalefactors=[2] + [0] * 20, global_gain=206,
        scalefac_scale=1,
    )
    g = read_mp3_granule(payload)
    xr = mp3_requantize(g)
    # gg 206 → 2^-1; sfb0 scalefactor 2 at multiplier 1 → 2^-2
    assert xr == [2.0 ** -3, 2.0 ** -3]


def test_requantize_four_thirds_power_law():
    """Magnitudes above 1 can't come from the table-1/count1 decode
    subset, but mp3_requantize implements the full |is|^(4/3) law —
    pinned against the closed form."""
    g = {
        "sample_rate": 44100,
        "scalefactors": [0] * 21,
        "global_gain": 210,
        "preflag": 0,
        "scalefac_scale": 0,
        "values": [8, -27],
        "count1_values": [],
    }
    xr = mp3_requantize(g)
    assert xr[0] == pytest.approx(8 ** (4 / 3), rel=1e-12)  # = 16
    assert xr[1] == pytest.approx(-(27 ** (4 / 3)), rel=1e-12)  # = -81


def test_requantize_preflag_pretab_bands():
    """preflag adds pretab[sfb] to the scalefactor — zero through band
    10, nonzero above (line 62 at 44.1 kHz is band 11, pretab 1)."""
    g = {
        "sample_rate": 44100,
        "scalefactors": [0] * 21,
        "global_gain": 210,
        "preflag": 1,
        "scalefac_scale": 1,
        "values": [0] * 62 + [1],
        "count1_values": [],
    }
    xr = mp3_requantize(g)
    assert _MP3_PRETAB[11] == 1
    assert xr[62] == 2.0 ** -1
    # scalefac_scale=0 → multiplier 0.5 → half-integer exponent
    g["scalefac_scale"] = 0
    assert mp3_requantize(g)[62] == 2.0 ** -0.5


def test_requantize_band21_has_no_scalefactor():
    bounds = _MP3_LONG_SFB[44100]
    line = bounds[21]  # first line of the last band
    g = {
        "sample_rate": 44100,
        "scalefactors": [3] * 21,
        "global_gain": 210,
        "preflag": 1,
        "scalefac_scale": 1,
        "values": [0] * line + [1],
        "count1_values": [],
    }
    assert mp3_requantize(g)[line] == 1.0  # no scalefactor, no pretab


def test_requantize_refusals():
    with pytest.raises(ValueError, match="sample rate"):
        mp3_requantize(
            {"sample_rate": 22050, "scalefactors": [], "global_gain": 210,
             "values": [1], "count1_values": []}
        )
    with pytest.raises(ValueError, match="576"):
        mp3_requantize(
            {"sample_rate": 44100, "scalefactors": [0] * 21,
             "global_gain": 210, "values": [1] * 577,
             "count1_values": []}
        )


def test_synthesize_count1_validation():
    with pytest.raises(ValueError, match="quadruples"):
        synthesize_mp3_spectrum([], count1_values=[1, 0, 1])
    with pytest.raises(ValueError, match="magnitudes"):
        synthesize_mp3_spectrum([], count1_values=[2, 0, 0, 0])
    with pytest.raises(ValueError, match="count1table"):
        synthesize_mp3_spectrum([], count1_values=[1, 0, 0, 0],
                                count1table=2)
    with pytest.raises(ValueError, match="global_gain"):
        synthesize_mp3_spectrum([1, 1], global_gain=256)
