from texttoaudiogrounding_tpu.evaluation.decode import (
    binarize,
    connect_clusters,
    decode_multi_threshold,
    find_contiguous_regions,
    median_filter,
    predictions_to_time,
)
from texttoaudiogrounding_tpu.evaluation.psds import (
    PSDSEvaluator,
    compute_psds,
    compute_psds_sed_scores,
    staircase_auc,
)
from texttoaudiogrounding_tpu.evaluation.th_auc import (
    GroundingPrecisionRecall,
    compute_th_auc,
)
from texttoaudiogrounding_tpu.evaluation.sed_metrics import (
    compute_sed_eval,
    event_based_metrics,
    segment_based_metrics,
)

__all__ = [
    "binarize", "median_filter", "connect_clusters",
    "find_contiguous_regions", "predictions_to_time",
    "decode_multi_threshold",
    "PSDSEvaluator", "compute_psds", "compute_psds_sed_scores",
    "staircase_auc", "GroundingPrecisionRecall", "compute_th_auc",
    "compute_sed_eval", "event_based_metrics", "segment_based_metrics",
]
