"""Model-file reader tests against the bundled en-us PTM model and the
an4 continuous model (mirrors test/unit/test_acmod.c scale checks and the
mdef header of model/en-us/en-us/mdef)."""

import numpy as np
import pytest

from pocketsphinx_tpu.fileio import (read_bin_mdef, read_gauden, read_sendump,
                                     read_tmat, read_mfc, read_sen)
from pocketsphinx_tpu.logmath import LogMath, default_logmath

from conftest import EN_US, DATADIR, GOLDEN, require_model


@pytest.fixture(scope="module")
def mdef():
    require_model()
    return read_bin_mdef(str(EN_US / "mdef"))


def test_mdef_counts(mdef):
    assert mdef.n_ciphone == 42
    assert mdef.n_phone == 137095
    assert mdef.n_emit_state == 3
    assert mdef.n_sen == 5126
    assert mdef.n_ci_sen == 126
    assert mdef.ciname[mdef.sil] == "SIL"
    assert mdef.ciname[0] == "+NSN+"


def test_mdef_phone_lookup(mdef):
    # CI phone for each name resolves; triphone lookup returns a CD phone
    # whose base/contexts round-trip.
    ah = mdef.ciphone_id("AH")
    t = mdef.ciphone_id("T")
    k = mdef.ciphone_id("K")
    assert ah >= 0 and t >= 0 and k >= 0
    from pocketsphinx_tpu.fileio.bin_mdef import WPOS_INTERNAL
    p = mdef.phone_id_nearest(ah, t, k, WPOS_INTERNAL)
    assert p >= mdef.n_ciphone
    assert mdef.phone_ci[p] == ah
    assert mdef.phone_lc[p] == t
    assert mdef.phone_rc[p] == k
    # senone sequence of a CI phone uses CI senones
    sseq = mdef.sseq[mdef.phone_ssid[ah]]
    assert (sseq < mdef.n_ci_sen).all()
    # sen2cimap is total and within range
    assert (mdef.sen2cimap >= 0).all()
    assert (mdef.sen2cimap < mdef.n_ciphone).all()


def test_gauden_en_us():
    require_model()
    # varfloor default is 1e-4 (src/config_macro.h:352); at that floor the
    # reference logs "222 variance values floored" for en-us.
    g = read_gauden(str(EN_US / "means"), str(EN_US / "variances"),
                    varfloor=1e-4)
    lane = np.arange(13)[None, :] < g.featlen[:, None]
    vmask = np.broadcast_to(lane[None, :, None, :], g.var.shape)
    assert int(((g.var < np.float32(1e-4)) & vmask).sum()) == 222
    assert (g.n_mgau, g.n_feat, g.n_density) == (42, 3, 128)
    assert list(g.featlen) == [13, 13, 13]
    assert g.means.shape == (42, 3, 128, 13)
    assert np.isfinite(g.means).all()
    assert g.det.shape == (42, 3, 128)
    # det = sum of logmath_log(1/sqrt(2 pi var)); magnitudes are bounded by
    # ~13 dims x |log| of extreme variances in logmath units
    assert np.abs(g.det.astype(np.int64)).max() < 13 * 200000
    assert (g.prec >= 0).all()
    # float and int precomputations agree to quantization error
    assert np.abs(g.det_f - g.det).max() < 16.0


def test_sendump_en_us():
    require_model()
    mw = read_sendump(str(EN_US / "sendump"), 5126, 3, 128)
    assert mw.mixw.shape == (3, 128, 5126)
    assert mw.n_sen == 5126
    # every senone has at least one good (low-cost) mixture weight
    assert (mw.mixw.min(axis=1) < 160).all()


def test_tmat_en_us():
    require_model()
    t = read_tmat(str(EN_US / "transition_matrices"), tpfloor=1e-4)
    assert t.tp.shape == (42, 3, 4)
    # Left-to-right: no backward transitions (upper-triangular)
    assert (t.tp[:, 1, 0] == 255).all()
    assert (t.tp[:, 2, 0] == 255).all()
    assert (t.tp[:, 2, 1] == 255).all()
    # self-loops all possible
    assert (t.tp[:, 0, 0] < 255).all()


def test_logmath_matches_reference_semantics():
    lm = LogMath(1.0001, 0, True)
    # logmath_log(1.0) == 0; exp round trip
    assert lm.log(1.0) == 0
    assert abs(lm.exp(lm.log(0.5)) - 0.5) < 1e-3
    # add: log(a+b) >= max(log a, log b)
    la, lb = lm.log(0.25), lm.log(0.125)
    ls = lm.add(la, lb)
    assert abs(lm.exp(ls) - 0.375) < 1e-3
    # zero semantics
    assert lm.add(lm.zero, la) == la
    # 8-bit shifted table: width check (table values fit a byte)
    lm8 = LogMath(1.0001, 10, True)
    assert lm8.table.max() < 256
    assert len(lm8.table) >= 256


def test_read_golden_mfc_and_sen():
    require_model()
    mfc_path = GOLDEN / "goforward" / "000000000.mfc"
    sen_path = GOLDEN / "goforward" / "000000000.sen"
    if not mfc_path.exists():
        pytest.skip("golden dumps not captured")
    cep = read_mfc(str(mfc_path))
    assert cep.shape[1] == 13
    assert cep.shape[0] > 250  # ~2.9s of audio at 100 fps
    scores, active, logbase = read_sen(str(sen_path))
    assert scores.shape[1] == 5126
    assert abs(logbase - 1.0001) < 1e-6
    # scores are non-negative costs with 0 = best in every frame
    assert (scores >= 0).all()
    assert (scores.min(axis=1) == 0).all()
    # goforward.mfc (classic corpus file) parses too
    cep2 = read_mfc(str(DATADIR / "goforward.mfc"))
    assert cep2.shape[1] == 13

def test_mdef_write_roundtrip(mdef, tmp_path):
    """Text and binary mdef writers: text -> bin payload byte-identical
    to the SHIPPED en-us mdef (which the reference's own converter
    produced), and full read/write cycles preserve every phone array."""
    import numpy as np
    from pocketsphinx_tpu.fileio.bin_mdef import (
        read_text_mdef, write_text_mdef, write_bin_mdef)
    txt = tmp_path / "mdef.txt"
    write_text_mdef(mdef, str(txt))
    head = txt.read_text().splitlines()
    assert head[0] == "0.3"
    assert f"{mdef.n_ciphone} n_base" in head[1]
    t = read_text_mdef(str(txt))
    binp = tmp_path / "mdef.bin"
    write_bin_mdef(t, str(binp))
    # payload (everything after the skipped header text) must equal the
    # reference-generated shipped file byte for byte
    def payload(p):
        d = open(p, "rb").read()
        hdrlen = np.frombuffer(d, "<i4", 1, 8)[0]
        return d[12 + hdrlen:]
    assert payload(str(binp)) == payload(str(EN_US / "mdef"))
    m2 = read_bin_mdef(str(binp))
    for f in ("phone_ssid", "phone_tmat", "phone_ci", "phone_lc",
              "phone_rc", "phone_wpos", "sseq"):
        np.testing.assert_array_equal(getattr(m2, f), getattr(mdef, f))
    assert m2.ciname == mdef.ciname and m2.sil == mdef.sil


def test_mdef_convert_cli(mdef, tmp_path):
    """pocketsphinx_mdef_convert equivalent: -text and -bin modes."""
    from pocketsphinx_tpu.cli_tools import mdef_convert_main
    txt = tmp_path / "out.txt"
    assert mdef_convert_main(["-text", str(EN_US / "mdef"), str(txt)]) == 0
    assert txt.read_text().startswith("0.3\n")
    binp = tmp_path / "out.bin"
    assert mdef_convert_main(["-bin", str(txt), str(binp)]) == 0
    m2 = read_bin_mdef(str(binp))
    assert m2.n_phone == mdef.n_phone
    # bad usage / unreadable input fail cleanly
    assert mdef_convert_main([]) == 1
    assert mdef_convert_main(["-text", "/nonexistent", str(txt)]) == 1
