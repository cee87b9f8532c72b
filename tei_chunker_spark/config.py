"""Job configuration for the extraction pipeline.

Mirrors the reference chunker's three knobs (reference
``tei_chunker/chunking.py:60-65``) plus Spark execution knobs that have no
reference analogue.  ``min_section_size`` is accepted for API compatibility
but is dead config in the reference too (stored at ``chunking.py:65``, never
read), so it deliberately has no effect here either.
"""
from __future__ import annotations

from dataclasses import dataclass, field


# The reference HTTP service instantiates HierarchicalChunker(20000, 200)
# (reference service.py:17); these are the production defaults we inherit.
DEFAULT_MAX_CHUNK_SIZE = 20000
DEFAULT_OVERLAP_SIZE = 200


@dataclass(frozen=True)
class ChunkerConfig:
    """Semantics-bearing knobs. Changing these changes golden outputs."""

    max_chunk_size: int = DEFAULT_MAX_CHUNK_SIZE
    overlap_size: int = DEFAULT_OVERLAP_SIZE
    min_section_size: int = 1000  # dead config, kept for parity (chunking.py:65)
    # Guardrail (None = off, golden behavior): documents whose reassembled
    # XML exceeds this many characters are NOT parsed — they emit zero text
    # spans (media passthrough unaffected) instead of risking a worker OOM.
    # The manifest's input_doc_count vs doc_count gap surfaces them.
    max_doc_chars: int | None = None


@dataclass(frozen=True)
class JobConfig:
    """Execution knobs. Changing these must NOT change outputs.

    num_buckets is the salt-bucket count used both for the shuffle
    (repartition key = pmod(xxhash64(doc_id), num_buckets * partitions_per_bucket))
    and for the checkpoint/resume granularity of the manifest.  At 100 TB /
    10^12 docs you would raise num_buckets into the thousands so a resume
    skips completed work at fine granularity; locally small values keep test
    jobs fast.
    """

    chunker: ChunkerConfig = field(default_factory=ChunkerConfig)
    num_buckets: int = 16
    shuffle_partitions: int = 64
    # Rows are whole documents, so Arrow batches stay modest to bound
    # Python-worker memory against the oversized-doc tail; 256 measured
    # fastest (64 pays per-batch pandas overhead, 1024 is GC-erratic).
    arrow_max_records_per_batch: int = 256
    input_format: str = "parquet"  # "iceberg" on a real cluster
    output_format: str = "parquet"
    # When the input table is already bucketed by pmod(xxhash64(doc_id), P)
    # (Iceberg `bucket(P, doc_id)` partitioning — the recommended layout at
    # 10^12 docs), the salt repartition is a no-op shuffle of ~all input
    # bytes; set True to elide it and run the Python stage directly on the
    # aligned scan partitions. Outputs are identical either way (pinned by
    # tests); this is purely a physical-plan decision.
    assume_bucketed_input: bool = False
