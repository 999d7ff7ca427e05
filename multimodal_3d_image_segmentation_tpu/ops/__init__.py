from . import spectral  # noqa: F401
from .dht import dhtn, dht2, dht3  # noqa: F401
