"""Term vectors — the IndexReader.getTermVector surface.

Reference: lucene/core/src/java/org/apache/lucene/index/
TermVectors / Lucene50TermVectorsFormat (.tvd/.tvx): a per-document
mini inverted index (term -> freq + positions) stored at index time
for highlighting and MoreLikeThis.

Spark-first: there is NO separate stored structure — the postings
already contain every (term, doc, freq, positions) tuple, so the term
vector of a doc is a read-time projection of its segment's postings
(one pushed-down scan of one segment + a narrow map).  This closes
the reference's term-vector surface without paying the .tvd storage
duplication: at 100 TB the reference's term-vector files roughly
double the index; here the postings ARE the vectors.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

__all__ = ["term_vector"]


def term_vector(searcher, doc_id: int) -> DataFrame:
    """(term, freq, positions array<int>) of one document, from the
    index itself (no re-analysis).  Requires a positions index."""
    from ..functions.codec import decode_term_postings
    from .search import rows_to_posting_map
    from .segments import SENTINEL_TERM

    seg_id = doc_id // searcher.cfg.segment_size
    local = doc_id - seg_id * searcher.cfg.segment_size
    seg = searcher.segments.filter(
        (F.col("segment_id") == seg_id) & (F.col("term") != SENTINEL_TERM)
    )

    def run(batches):
        for pdf in batches:
            terms, freqs, poss = [], [], []
            # one itertuples pass builds every TermPostings; the
            # per-term work is then only the decode itself (the old
            # per-row pandas .iloc slicing was pure overhead)
            for term, tp in rows_to_posting_map(pdf).items():
                docs, fr, pos = decode_term_postings(tp, with_positions=True)
                j = np.searchsorted(docs, local)
                if j < len(docs) and docs[j] == local:
                    terms.append(term)
                    freqs.append(int(fr[j]))
                    if pos is not None:
                        starts = np.concatenate(([0], np.cumsum(fr)))
                        poss.append(
                            pos[starts[j] : starts[j + 1]].astype(np.int32).tolist()
                        )
                    else:
                        poss.append([])
            yield pd.DataFrame(
                {"term": terms, "freq": freqs, "positions": poss}
            )

    return seg.mapInPandas(
        run, schema="term string, freq int, positions array<int>"
    )
