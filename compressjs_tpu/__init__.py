"""compressjs_tpu — a TPU-native lossless block-compression framework.

Capability-parity rebuild of the cscott/compressjs codec suite
(bzip2, BWTC, LZP3, LZJB, LZJB-R, PPM, DMC, Simple + the entropy coders
and adaptive models they are built from), re-architected for TPU:
array-in/array-out block pipelines, jittable transform kernels
(suffix sort, MTF, RLE, Huffman bit packing), and data-parallel block
sharding over a jax.sharding.Mesh.
"""

__version__ = '0.1.0'

from .utils import stream as _stream_mod
from .utils.stream import Stream, BitStream
from .ops import bwt as BWT
from .coders.range_coder import RangeCoder
from .coders.dummy_range_coder import DummyRangeCoder
from .coders.huffman import Huffman
from .coders import huffman_allocator as HuffmanAllocator
from .models.mtf_model import MTFModel
from .models.fenwick_model import FenwickModel
from .models.defsum_model import DefSumModel
from .models.context1_model import Context1Model
from .models.no_model import NoModel
from .models.log_distance_model import LogDistanceModel
from .models.deflate_distance_model import DeflateDistanceModel

version = __version__

# codec registry is populated lazily to keep import cheap; see __getattr__
_CODEC_MODULES = {
    'Bzip2': '.codecs.bzip2',
    'BWTC': '.codecs.bwtc',
    'Lzp3': '.codecs.lzp3',
    'Lzjb': '.codecs.lzjb',
    'LzjbR': '.codecs.lzjbr',
    'PPM': '.codecs.ppm',
    'Dmc': '.codecs.dmc',
    'Simple': '.codecs.simple',
    'BWTCP': '.codecs.bwtcp',
}


def __getattr__(name):
    if name in _CODEC_MODULES:
        import importlib
        mod = importlib.import_module(_CODEC_MODULES[name], __name__)
        obj = getattr(mod, name)
        globals()[name] = obj
        return obj
    raise AttributeError(name)


def __dir__():
    return sorted(set(globals()) | set(_CODEC_MODULES))
