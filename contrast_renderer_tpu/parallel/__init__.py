"""Multi-chip scaling: band-sharded frame rendering over a device mesh.

The reference is single-device (SURVEY §2 parallelism inventory); this
package is the TPU-native extension: the frame's pixel rows are sharded
across a `jax.sharding.Mesh` axis, each device rendering its band with
a band-adjusted projection — no collectives beyond the output layout.
"""

from .mesh import render_sharded  # noqa: F401
