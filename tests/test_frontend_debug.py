"""TestShapeCS debug frontend (reference bellpepper/test_shape_cs.rs)."""

from spartan2_tpu.field.constants import get_field
from spartan2_tpu.frontend.constraint_system import ONE, lc
from spartan2_tpu.frontend.test_shape_cs import TestShapeCS

F = get_field("pallas_scalar")


def test_pretty_print_and_namespaces():
    cs = TestShapeCS(F)
    x = cs.alloc(name="x")
    with cs.namespace("sq"):
        xsq = cs.alloc(name="x_sq")
        cs.enforce(lc((1, x)), lc((1, x)), lc((1, xsq)), name="square")
    y = cs.alloc_input(name="y")
    cs.enforce(lc((1, xsq), (4, x), (F.modulus - 1, ONE)), lc((1, ONE)),
               lc((1, y)), name="out")

    assert cs.num_constraints() == 2
    assert cs.pretty_print_list() == [
        "INPUT y", "AUX x", "AUX sq/x_sq", "sq/square", "out"]
    printed = cs.pretty_print()
    assert "sq/square: (`Ax`) * (`Ax`) = (`Asq/x_sq`)" in printed
    assert "out: (- `IONE` + 2^2 . `Ax` + `Asq/x_sq`) * (`IONE`) = (`Iy`)" in printed


def test_shape_compatible_with_standard_cs():
    """TestShapeCS must drive shape synthesis like the plain shape-mode
    ConstraintSystem (counts line up)."""
    cs = TestShapeCS(F)
    a = cs.alloc(name="a")
    b = cs.alloc(name="b")
    cs.enforce(lc((1, a)), lc((1, b)), lc((1, a)), name="mul")
    assert cs.num_aux == 2
    assert cs.num_inputs == 1  # ONE only
    assert len(cs.constraints) == 1
