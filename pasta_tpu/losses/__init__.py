"""Training objectives: non-saturating GAN, R1, L1, VGG perceptual,
weighted parsing cross-entropy, contextual."""

from .gan import g_nonsat_loss, d_logistic_loss, r1_penalty
from .parsing import weighted_parsing_ce
from .vgg import VGG19Features, vgg_loss
