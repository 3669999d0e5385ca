from .transducer import Transducer, TransducerConfig  # noqa: F401
from .lm import LM  # noqa: F401
