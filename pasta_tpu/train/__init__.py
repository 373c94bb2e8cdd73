"""Training: ADA augmentation, phase scheduling, SPMD train steps, loop."""
