from .range_coder import RangeCoder
from .dummy_range_coder import DummyRangeCoder
from .huffman import Huffman
from .huffman_allocator import allocate_huffman_code_lengths
