from .mtf_model import MTFModel
from .fenwick_model import FenwickModel
from .defsum_model import DefSumModel
from .context1_model import Context1Model
from .no_model import NoModel
from .log_distance_model import LogDistanceModel
from .deflate_distance_model import DeflateDistanceModel
