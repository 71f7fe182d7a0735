from . import stream, util, crc32
from .stream import (Stream, BitStream, BufferStream, ArrayInputStream,
                     coerce_input_stream, coerce_output_stream, EOF)
from .crc32 import CRC32, crc32_bzip2, stream_crc_combine
