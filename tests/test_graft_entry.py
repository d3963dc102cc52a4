"""Driver entry-point regressions.

Round 1's driver run recorded MULTICHIP ok=false: the in-process env
guard in dryrun_multichip did nothing once the driver had already
imported jax with a live accelerator client, and device_put crashed on
it.  The entry now always isolates the dry run in a spawned CPU-only
subprocess — these tests call it the way the driver does: with jax
already imported (whatever backend this session uses) in the calling
process.
"""

import numpy as np
import pytest

#: The driver exercises both entry points on every round; the fast
#: gate need not pay their compiles again.
pytestmark = pytest.mark.slow


def test_dryrun_multichip_with_jax_already_imported():
    import jax

    # Materialize the parent's default backend first — the exact state
    # that broke the round-1 in-process guard.
    _ = jax.devices()

    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_entry_returns_jittable_step():
    import jax

    import __graft_entry__ as g

    fn, args = g.entry()
    lowered = jax.jit(fn).lower(*args)
    assert lowered is not None
