"""Scene gallery: prebuilt scenes mirroring the reference's examples."""

from . import showcase  # noqa: F401
