"""Quality metrics: FID / KID / IS / precision-recall / PPL on TPU.

Reference: /root/reference/metrics/ (metric_main registry, FeatureStats,
formula modules). Feature extraction runs as batched jitted TPU inference;
detector weights are imported from torchvision-format checkpoints (zero-egress
environments must supply the files; the formulas and harness are self-contained).
"""

from .feature_stats import FeatureStats
from .fid import compute_fid
from .kid import compute_kid
from .inception_score import compute_is
from .precision_recall import compute_pr
