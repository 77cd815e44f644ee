"""Reference-anchored golden for the optimizer defaults table.

The reference's OPTIMIZER_DEFAULT_PARAMETERS
(/root/reference/modules/util/optimizer_util.py:69-...) drives
change_optimizer / load_optimizer_defaults — the values users get when
they pick an optimizer in the UI/config. That module imports mgds (not
installed here), so the table is extracted from the SOURCE via ast
instead of importing, then compared key-by-key with
onetrainer_tpu/util/optimizer_util.py's table.

Keys documented as not re-implemented (library-internal knobs of the
reference's external optimizer packages — STATUS.md §2.8) are allowed to
be ABSENT here, but any key present in both tables must agree exactly.
"""
import ast

import pytest

REF_FILE = "/root/reference/modules/util/optimizer_util.py"

from onetrainer_tpu.util.enums import Optimizer  # noqa: E402
from onetrainer_tpu.util.optimizer_util import (  # noqa: E402
    OPTIMIZER_DEFAULT_PARAMETERS,
)


def _ref_table():
    tree = ast.parse(open(REF_FILE).read())
    for node in ast.walk(tree):
        if (isinstance(node, ast.Assign)
                and isinstance(node.targets[0], ast.Name)
                and node.targets[0].id == "OPTIMIZER_DEFAULT_PARAMETERS"):
            table = {}
            for k, v in zip(node.value.keys, node.value.values):
                assert isinstance(k, ast.Attribute)  # Optimizer.X
                params = {}
                for pk, pv in zip(v.keys, v.values):
                    key = ast.literal_eval(pk)
                    if (isinstance(pv, ast.Call)
                            and ast.unparse(pv) == "float('inf')"):
                        params[key] = float("inf")
                    else:
                        params[key] = ast.literal_eval(pv)
                table[k.attr] = params
            return table
    raise AssertionError("table not found in reference source")


def test_defaults_table_matches_reference():
    # reference member names are mixed-case for AdEMAMix — compare upper
    ref = {name.upper(): params for name, params in _ref_table().items()}
    mine = {opt.name.upper(): params
            for opt, params in OPTIMIZER_DEFAULT_PARAMETERS.items()}

    assert set(ref) == set(mine), (
        set(ref) ^ set(mine))  # all 35 optimizers present on both sides

    mismatches = []
    missing = []
    for name, ref_params in ref.items():
        for key, ref_val in ref_params.items():
            if key not in mine[name]:
                missing.append(f"{name}.{key}")
            elif mine[name][key] != ref_val:
                mismatches.append(
                    f"{name}.{key}: mine={mine[name][key]!r} ref={ref_val!r}")
    # shared keys must agree exactly — a silent default drift changes
    # what users train with. Single documented deviation: optax's
    # schedule_free cannot represent b1=0 (it divides by b1 to recover
    # eval params), so SF-SGD defaults to momentum=0.9 instead of the
    # reference's 0 and create_optimizer raises on an explicit 0.
    allowed_mismatch = {"SCHEDULE_FREE_SGD.momentum: mine=0.9 ref=0"}
    assert set(mismatches) <= allowed_mismatch, mismatches
    # keys we consciously don't carry must be the documented
    # library-internal / external-package-variant set only (STATUS.md §2.8)
    allowed_absent = {
        # bitsandbytes / torch internals
        "optim_bits", "min_8bit_size", "percentile_clipping", "block_wise",
        "is_paged", "fused_back_pass", "foreach", "capturable",
        "differentiable", "fused", "maximize", "use_triton", "log_every",
        "fsdp_in_use", "slice_p", "dampening", "max_unorm",
        # pytorch_optimizer / dadaptation / prodigyplus variant toggles
        "no_prox", "adanorm", "adam_debias", "ams_bound", "r",
        "bias_correction", "cautious", "decoupled_decay", "fixed_decay",
        "rectify", "degenerated_to_sgd", "n_sma_threshold",
        "initial_accumulator", "use_bias_correction", "amsgrad",
        "adam_w_mode", "growth_rate", "prodigy_steps", "use_speed",
        "split_groups", "split_groups_mean", "factored", "factored_fp32",
        "use_stableadamw", "use_muon_pp", "use_cautious", "use_grams",
        "use_adopt", "use_focus", "weight_decay_by_lr",
        "stochastic_rounding",
    }
    unexpected = [m for m in missing
                  if m.split(".", 1)[1] not in allowed_absent]
    assert not unexpected, unexpected
    # ...but amsgrad must stay PRESENT where the optax path consumes it
    for name in ("ADAM", "ADAMW", "ADAM_8BIT", "ADAMW_8BIT"):
        assert "amsgrad" in mine[name]


def test_extra_keys_beyond_reference_are_known():
    """Keys this repo adds on top of the reference defaults must be the
    deliberate additions only (nothing drifting in unnoticed)."""
    ref = {name.upper(): params for name, params in _ref_table().items()}
    # clip_threshold: this repo's CAME exposes the paper's update-clipping
    # threshold that the reference's vendored CAME hardcodes
    known_additions = {"stochastic_rounding", "clip_threshold"}
    extras = []
    for opt, params in OPTIMIZER_DEFAULT_PARAMETERS.items():
        for key in params:
            if key not in ref[opt.name.upper()] and key not in known_additions:
                extras.append(f"{opt.name}.{key}")
    assert not extras, extras


def test_every_reference_enum_value_parses():
    """Every string value of every reference enum must round-trip through
    the local enums, whatever its casing — the reference serializes a few
    members in mixed case (Optimizer.AdEMAMix). A value that doesn't parse
    makes a GUI-authored config silently fall back to the field default
    (the AdEMAMix -> ADAMW regression this caught)."""
    import ast as ast_mod
    import glob

    import onetrainer_tpu.util.enums as my_enums

    failures = []
    checked = 0
    for path in sorted(glob.glob("/root/reference/modules/util/enum/*.py")):
        tree = ast_mod.parse(open(path).read())
        for node in ast_mod.walk(tree):
            if not isinstance(node, ast_mod.ClassDef):
                continue
            my_cls = getattr(my_enums, node.name, None)
            if my_cls is None:
                continue  # enums for descoped subsystems
            for stmt in node.body:
                if (isinstance(stmt, ast_mod.Assign)
                        and isinstance(stmt.value, ast_mod.Constant)
                        and isinstance(stmt.value.value, str)):
                    checked += 1
                    try:
                        my_cls(stmt.value.value)
                    except ValueError:
                        failures.append(
                            f"{node.name}.{stmt.targets[0].id}"
                            f" = {stmt.value.value!r}")
    assert checked > 120  # the audit actually covered the enum surface
    assert not failures, failures
