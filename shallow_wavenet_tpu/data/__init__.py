"""L1 data/IO layer: wav IO, HDF5 feature files, file lists, batching.

Component C10 of SURVEY.md §2.1. No libsndfile in this environment — wav IO
uses stdlib `wave` + numpy int16 PCM (SURVEY.md §2.3).
"""

from shallow_wavenet_tpu.data.audio_io import read_wav, write_wav  # noqa: F401
from shallow_wavenet_tpu.data.hdf5_io import read_hdf5, write_hdf5  # noqa: F401
