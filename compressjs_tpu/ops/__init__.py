from . import bwt
