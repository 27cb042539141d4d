"""Bit-exact senone-score parity against the reference binary's golden
`-senlogdir -compallsen` dump (the M2 gate in SURVEY.md §7: scoring parity
before any search work)."""

import numpy as np
import pytest

from pocketsphinx_tpu.fileio import (read_bin_mdef, read_gauden, read_sendump,
                                     read_mfc, read_sen)
from pocketsphinx_tpu.frontend.feat import compute_feats
from pocketsphinx_tpu.ops.senone_parity import PTMParityScorer

from conftest import DATADIR, EN_US, GOLDEN, require_model


@pytest.fixture(scope="module")
def model():
    require_model()
    mdef = read_bin_mdef(str(EN_US / "mdef"))
    g = read_gauden(str(EN_US / "means"), str(EN_US / "variances"), 1e-4)
    mw = read_sendump(str(EN_US / "sendump"), mdef.n_sen, g.n_feat, g.n_density)
    return mdef, g, mw


def test_int_parity_senone_scores(model):
    mdef, g, mw = model
    mfc_path = GOLDEN / "goforward" / "000000000.mfc"
    if not mfc_path.exists():
        pytest.skip("golden dumps not captured")
    cep = read_mfc(str(mfc_path))
    feats = compute_feats(cep, cmn="batch")
    golden, active, _ = read_sen(str(GOLDEN / "goforward" / "000000000.sen"))
    assert active.all(), "golden dump must be -compallsen"

    scorer = PTMParityScorer(g, mw, mdef.sen2cimap)
    T = len(feats)
    mine = scorer.score_utt(feats)

    # The reference dump stream interleaves the phone-loop lookahead
    # (pl_window=5 scores frames ahead) with the main search's re-score of
    # each frame (identical values, cached top-N): audio frame t appears at
    # dump position t for t < 6 and at 2t-5 (plus a duplicate at 2t+6)
    # afterwards.  Require exact equality on every audio frame: this
    # validates the full numeric contract of feat + PTM scoring (float32
    # order, truncation, streaming top-N, shift/clamp, table log-add).
    bad = []
    for t in range(T):
        gi = t if t < 6 else 2 * t - 5
        if not (mine[t] == golden[gi]).all():
            bad.append((t, int((mine[t] != golden[gi]).sum()),
                        int(np.abs(mine[t].astype(int)
                                   - golden[gi].astype(int)).max())))
    assert not bad, f"{len(bad)}/{T} frames mismatch: {bad[:5]}"
    # Duplicate (main-search) stream must also match bit-for-bit.
    dup_ok = sum((mine[t] == golden[2 * t + 6]).all() for t in range(272))
    assert dup_ok == 272


def test_semi_int_parity_senone_scores():
    """Semi-continuous (tidigits, 4-bit cluster sendump, 4-stream s2_4x)
    bit-exact parity: the semi scorer selects 4-bit nibbles by senone
    parity (src/s2_semi_mgau.c:694-699), NOT by the PTM byte-low-bit
    quirk (ptm_mgau.c:377) — getting this wrong scrambles half the
    mixture weights.  Golden: reference `-senlogdir -compallsen yes`
    dump on man.ah.1b.mfc (FSG mode => no phone-loop interleave; the
    semi scorer emits unnormalized scores, so compare shifted to
    per-frame best)."""
    from pocketsphinx_tpu.models.acoustic import AcousticModel
    from pocketsphinx_tpu.frontend.feat import compute_feats_typed
    tid = DATADIR / "tidigits"
    sen_path = GOLDEN / "tidigits" / "man.ah.1b.sen"
    if not tid.is_dir() or not sen_path.exists():
        pytest.skip("tidigits fixtures missing")
    am = AcousticModel.load(str(tid / "hmm"))
    assert am.model_type == "semi"
    golden, active, _ = read_sen(str(sen_path))
    assert active.all()
    feats, _ = compute_feats_typed(read_mfc(str(tid / "man.ah.1b.mfc")),
                                   feat_type="s2_4x", cmn="current")
    scorer = PTMParityScorer(am.gauden, am.mixw,
                             np.zeros(am.n_sen, np.int64), max_topn=4)
    mine = scorer.score_utt(feats)
    assert mine.shape == golden.shape
    g = golden.astype(np.int64)
    g -= g.min(axis=1, keepdims=True)
    assert (mine == g).all(), \
        f"{(mine != g).any(axis=1).sum()}/{len(g)} frames mismatch"
