"""Static Mosaic-alignment guard for the Pallas kernel files.

Round 3's final commit shipped a megakernel that every CPU test passed and
the TPU rejected: ``uni_ref[0, pl.ds(5 * b, 5), :]`` — a multi-row dynamic
sublane slice whose offset Mosaic "cannot statically prove ... is a
multiple of 8" (BENCH_r03.json rc=1). Interpret mode enforces none of the
Mosaic layout rules, so nothing in CI could catch it.

This file converts that on-hardware failure class into a CI failure:

* every dynamic sublane slice in the kernel files must route through
  ``pallas_trace.ds8``, which CHECKS the static stride/size factors at
  trace time (raw ``pl.ds`` / ``pl.dslice`` / bare ``pl.multiple_of``
  claims are banned by AST scan — ``pl.multiple_of`` asserts alignment to
  Mosaic without verifying it);
* ``ds8`` itself must reject the ee5d2bf layout (stride 5, size 5) and
  accept every layout the shipped kernels use.
"""

import ast
import pathlib

import pytest

from unityraytracer_tpu.ops.pallas_trace import ds8

OPS = pathlib.Path(__file__).resolve().parents[1] / "unityraytracer_tpu" / "ops"
KERNEL_FILES = ["pallas_trace.py", "pallas_path.py", "pallas_env.py"]
BANNED = {"ds", "dslice", "multiple_of"}  # attrs of `pl` legal only in ds8


def _violations(path: pathlib.Path):
    tree = ast.parse(path.read_text(), filename=str(path))
    # Line ranges of the ds8 definition (the one place raw pl.ds may live).
    allowed = []
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef) and node.name == "ds8":
            allowed.append((node.lineno, node.end_lineno))
    out = []
    for node in ast.walk(tree):
        if not (isinstance(node, ast.Attribute) and node.attr in BANNED
                and isinstance(node.value, ast.Name)
                and node.value.id == "pl"):
            continue
        if any(lo <= node.lineno <= hi for lo, hi in allowed):
            continue
        out.append(f"{path.name}:{node.lineno}: pl.{node.attr}")
    return out


def test_no_raw_dynamic_slices_in_kernel_files():
    """All dynamic sublane slices go through the checked ds8 helper."""
    bad = []
    for name in KERNEL_FILES:
        p = OPS / name
        if p.exists():
            bad += _violations(p)
    assert not bad, (
        "raw pl.ds/pl.dslice/pl.multiple_of in kernel files (use "
        "pallas_trace.ds8, which CHECKS Mosaic 8-alignment at trace time "
        "instead of claiming it): " + ", ".join(bad))


def test_ds8_rejects_the_ee5d2bf_layout():
    """stride 5 x size 5 is exactly the round-3 TPU-breaking slice."""
    with pytest.raises(ValueError, match="% 8"):
        ds8(5, 0, 5)


@pytest.mark.parametrize("stride,size", [(8, 8), (24, 24), (72, 72),
                                         (1, 1), (16, 8), (8, 16)])
def test_ds8_accepts_shipped_layouts(stride, size):
    ds8(stride, 3, size)


@pytest.mark.parametrize("stride,size", [(4, 8), (8, 4), (5, 5), (8, 12),
                                         (12, 8), (2, 2)])
def test_ds8_rejects_misaligned_layouts(stride, size):
    with pytest.raises(ValueError):
        ds8(stride, 3, size)


def test_ds8_requires_static_factors():
    with pytest.raises(TypeError):
        ds8("8", 0, 8)
    with pytest.raises(TypeError):
        ds8(8, 0, None)
