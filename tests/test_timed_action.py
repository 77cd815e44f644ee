"""Reference-anchored goldens for the timed-action scheduler.

Imports the reference's own TimedActionMixin (torch-free) and asserts
our scheduler fires at exactly the same (epoch, epoch_step, global_step)
points for the EPOCH and STEP units, both start_at_zero modes — the
exact semantics a latent bug diverged on (EPOCH fired on every step of a
matching epoch instead of once at epoch_step 0)."""
import sys

import pytest

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

from modules.util.TimedActionMixin import TimedActionMixin as RefMixin  # noqa: E402
from modules.util.TrainProgress import TrainProgress as RefProgress  # noqa: E402
from modules.util.enum.TimeUnit import TimeUnit as RefTimeUnit  # noqa: E402

from onetrainer_tpu.util.enums import TimeUnit  # noqa: E402
from onetrainer_tpu.util.timed_action import TimedActionMixin  # noqa: E402
from onetrainer_tpu.util.train_progress import TrainProgress  # noqa: E402


def _walk(steps_per_epoch=3, epochs=4):
    """All (epoch, epoch_step, global_step) points of a training walk."""
    g = 0
    for e in range(epochs):
        for s in range(steps_per_epoch):
            yield e, s, g
            g += 1


@pytest.mark.parametrize("unit", [TimeUnit.EPOCH, TimeUnit.STEP])
@pytest.mark.parametrize("interval", [1, 2, 3])
@pytest.mark.parametrize("start_at_zero", [True, False])
def test_repeating_action_matches_reference(unit, interval, start_at_zero):
    ref_unit = RefTimeUnit[unit.name]
    ours, ref = TimedActionMixin(), RefMixin()
    for epoch, epoch_step, global_step in _walk():
        our_p = TrainProgress(epoch=epoch, epoch_step=epoch_step,
                              global_step=global_step)
        ref_p = RefProgress(epoch=epoch, epoch_step=epoch_step,
                            global_step=global_step)
        got = ours.repeating_action_needed(
            "x", interval, unit, our_p, start_at_zero=start_at_zero)
        want = ref.repeating_action_needed(
            "x", interval, ref_unit, ref_p, start_at_zero=start_at_zero)
        assert got == want, (unit, interval, start_at_zero,
                             epoch, epoch_step, global_step)


@pytest.mark.parametrize("unit", [TimeUnit.EPOCH, TimeUnit.STEP])
@pytest.mark.parametrize("interval", [0, 2])
def test_single_action_elapsed_matches_reference(unit, interval):
    ref_unit = RefTimeUnit[unit.name]
    ours, ref = TimedActionMixin(), RefMixin()
    for epoch, epoch_step, global_step in _walk():
        our_p = TrainProgress(epoch=epoch, epoch_step=epoch_step,
                              global_step=global_step)
        ref_p = RefProgress(epoch=epoch, epoch_step=epoch_step,
                            global_step=global_step)
        got = ours.single_action_elapsed("y", interval, unit, our_p)
        want = ref.single_action_elapsed("y", interval, ref_unit, ref_p)
        assert got == want, (unit, interval, epoch, epoch_step, global_step)
