"""Pure-Python kernel: the reference semantics, no Spark, no external deps.

Every module documents which reference behavior it reproduces with
``/root/reference/<file>:<line>`` citations so parity can be audited.
"""

from deduce_spark.kernel.distance import within_edit_distance
from deduce_spark.kernel.tokenize import Tok, Tokenizer
from deduce_spark.kernel.mention import Mention

__all__ = ["within_edit_distance", "Tok", "Tokenizer", "Mention"]
