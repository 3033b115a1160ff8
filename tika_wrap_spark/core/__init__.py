"""Pure-Python extraction core. No Spark imports allowed in this package —
the same functions generate golden fixtures (plain pandas/python) and run
inside Arrow-batched Spark UDFs, guaranteeing byte-identical span output.
"""

from tika_wrap_spark.core.errors import ExtractError
from tika_wrap_spark.core.sniff import sniff_kind
from tika_wrap_spark.core.extract import extract_document

__all__ = ["ExtractError", "sniff_kind", "extract_document"]
