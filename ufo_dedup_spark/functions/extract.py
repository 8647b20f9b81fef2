"""HTML -> text extraction as an Arrow-batched pandas UDF.

The north-rule invariant: extraction is a pinned, versioned algorithm whose
output is byte-identical per url across runs and engines. EXTRACTOR_VERSION
is part of every checkpoint manifest; changing the algorithm bumps it and
invalidates downstream checkpoints.

The algorithm here handles the engine's canonical page template (main
content inside the first <p>...</p> block, entity-escaped). Real-world
boilerplate removal (readability/trafilatura-class) would slot in behind the
same UDF signature; those libraries are not available in this container, so
the template extractor is the pinned implementation and is exercised against
the synthetic corpus' ground-truth text column.
"""

from __future__ import annotations

import html as html_mod
import re

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

EXTRACTOR_VERSION = "template-p-v1"

_P_RE = re.compile(rb"<p>(.*?)</p>", re.DOTALL)


@pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """bytes -> extracted main text (None when no content block found)."""
    out: list[str | None] = []
    for raw in html:
        if raw is None:
            out.append(None)
            continue
        m = _P_RE.search(bytes(raw))
        if not m:
            out.append(None)
            continue
        out.append(html_mod.unescape(m.group(1).decode("utf-8", "replace")))
    return pd.Series(out, dtype="object")
