from .conversation import stream_conversation_shape
from .convrules import (stream_conversation_rules,
                        stream_conversation_rules_agg)
from .dedup import stream_exact_dedup
from .diffcheck import stream_transcript_diff
from .minhash import stream_minhash_pairs
from .profile import (numeric_drift_baseline, stream_column_profile,
                      stream_drift, stream_length_drift,
                      stream_numeric_drift)
from .referential import stream_referential_orphans
from .simhash import stream_simhash_pairs
from .uniqueness import stream_uniqueness_violations
from .validate import (stream_ordering_violations,
                       stream_partition_metrics, stream_violations)

__all__ = ["stream_violations", "stream_partition_metrics",
           "stream_ordering_violations", "stream_exact_dedup",
           "stream_column_profile", "stream_drift",
           "stream_length_drift", "stream_simhash_pairs",
           "stream_minhash_pairs",
           "stream_referential_orphans", "stream_conversation_shape",
           "stream_conversation_rules", "stream_conversation_rules_agg",
           "stream_uniqueness_violations", "stream_numeric_drift",
           "numeric_drift_baseline", "stream_transcript_diff"]
