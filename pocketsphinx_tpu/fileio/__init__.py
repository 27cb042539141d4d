"""Host-side model/data file readers (NumPy), feeding device arrays.

Replaces the reference's C parsing substrate (src/util/bio.c, src/bin_mdef.c,
src/ms_gauden.c, src/ptm_mgau.c readers, src/tmat.c, src/dict.c) — see
SURVEY.md §2.2.
"""

from .s3 import S3File
from .bin_mdef import BinMdef, read_bin_mdef
from .acoustic import (Gauden, MixtureWeights, Tmat, read_gauden,
                       read_sendump, read_mixw_quantized, read_mixw_float,
                       read_tmat, read_lda)
from .mfc import read_mfc, write_mfc, read_sen, write_sen

__all__ = [
    "S3File", "BinMdef", "read_bin_mdef", "Gauden", "MixtureWeights",
    "Tmat", "read_gauden", "read_sendump", "read_mixw_quantized",
    "read_mixw_float", "read_tmat", "read_lda", "read_mfc", "write_mfc", "read_sen", "write_sen",
]
