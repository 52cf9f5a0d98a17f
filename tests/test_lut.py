"""LUT folder parsing: header.txt, section files, neutral defaults."""

import numpy as np

from picsong_tpu.core.lut import (LUTParams, NEUTRAL_PROBABILITY, group_base,
                                  load_lut_channel, load_luts, neutral_lut,
                                  parse_lut_header)


def write_lut_folder(tmp_path, wavelet_levels=2, records=None, n_files=3):
    (tmp_path / "header.txt").write_text(
        "LUT_N_BITPLANES;15\nLUT_N_SUBBANDS;3\nN_CONTEXT_REFINEMENT;1\n"
        "N_CONTEXT_SIGN;4\nN_CONTEXT_SIGNIFICANCE;9\nMULT_PRECISION;7\n"
        f"LUT_N_FILES;{n_files}\nAMOUNT_OF_BITPLANE_FILES;15"
    )
    records = records or {}
    for stem, n_ctx in (("ref", 1), ("sig", 9), ("sign", 4)):
        for suffix in (["R", "G", "B"] if n_files == 3 else [""]):
            lines = []
            for (lvl, sb, bp), vals in records.get(stem, {}).items():
                lines.append(f"{lvl} {sb} {bp} : " + " ".join(str(v) for v in vals))
            (tmp_path / f"{stem}{suffix}.txt_0").write_text("\n".join(lines) + "\n")
    return str(tmp_path)


def test_parse_header(tmp_path):
    folder = write_lut_folder(tmp_path)
    params = parse_lut_header(folder + "/header.txt")
    assert params == LUTParams()


def test_neutral_default_and_record_placement(tmp_path):
    records = {
        "ref": {(0, 0, 0): [73], (0, 0, 1): [76]},
        "sig": {(1, 2, 3): [1, 2, 3, 4, 5, 6, 7, 8, 9]},
        "sign": {(2, 0, 0): [66, 62, 63, 61]},
    }
    folder = write_lut_folder(tmp_path, wavelet_levels=2, records=records)
    params = parse_lut_header(folder + "/header.txt")
    L = 2
    lut = load_lut_channel(folder, params, L, 2, channel=1, s_index=0)

    offsets = params.section_offsets(L, 2)
    nbp = params.n_bitplanes
    # ref records: group (0,0), bitplanes 0 and 1
    base = offsets["ref"] + group_base(params, L, 0, 0, 1)
    assert lut[base + 0] == 73 and lut[base + 1] == 76
    assert lut[base + 2] == NEUTRAL_PROBABILITY
    # sig record: group (1,2), bitplane 3
    base = offsets["sig"] + group_base(params, L, 1, 2, 9) + 3 * 9
    assert list(lut[base:base + 9]) == [1, 2, 3, 4, 5, 6, 7, 8, 9]
    # sign record: (2,0) is the residual-LL group when wavelet_levels == 2
    base = offsets["sign"] + group_base(params, L, 2, 0, 4)
    assert list(lut[base:base + 4]) == [66, 62, 63, 61]
    # sizes line up with the section formula
    assert lut.size == params.size_per_group(L, 2)
    assert offsets["sig"] - offsets["ref"] == (3 * nbp * 1 * L + nbp * 1)


def test_load_luts_three_channels(tmp_path):
    folder = write_lut_folder(tmp_path)
    luts, params = load_luts(folder, wavelet_levels=2, coding_passes=2, k_factor=0.0)
    assert len(luts) == 3
    for lut in luts:
        assert lut.size == params.size_per_group(2, 2)


def test_neutral_lut_size():
    params = LUTParams()
    lut = neutral_lut(params, wavelet_levels=5, coding_passes=2)
    assert lut.size == params.size_per_group(5, 2)
    assert np.all(lut == NEUTRAL_PROBABILITY)


def test_reference_lut_folder():
    """Parse the upstream LUT data (mounted read-only at /root/reference)."""
    folder = "/root/reference/CUDA_ImCod/LUT/n1_lossless"
    luts, params = load_luts(folder, wavelet_levels=5, coding_passes=2, k_factor=0.0)
    assert len(luts) == 3
    assert params.n_bitplanes == 15 and params.mult_precision == 7
    # spot-check first refR record: "0 0 0 : 73"
    assert luts[0][0] == 73


def test_shipped_trained_lut_folders():
    """The repo ships trained LUT folders (tools/lut_train.py output)."""
    import os
    root = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "luts")
    for name in ("trained_lossless", "trained_lossy"):
        luts, params = load_luts(os.path.join(root, name), wavelet_levels=5,
                                 coding_passes=2, k_factor=0.0)
        assert len(luts) == 3
        assert params.n_bitplanes == 15
        # trained, not neutral: a large share of cells must differ from 64
        assert np.mean(luts[0] != NEUTRAL_PROBABILITY) > 0.2
