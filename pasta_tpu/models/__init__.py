from .generator import Generator, SynthesisNetwork
from .discriminator import Discriminator

__all__ = ["Generator", "SynthesisNetwork", "Discriminator"]
