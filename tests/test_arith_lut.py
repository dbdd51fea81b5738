"""Exhaustive check: arithmetic LUT forms == table forms."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from brotlig_tpu.format import constants as C
from brotlig_tpu.format import lut
from brotlig_tpu.ops import arith_lut


def test_length_code_tables():
    c = jnp.arange(24, dtype=jnp.int32)
    np.testing.assert_array_equal(np.asarray(arith_lut.insert_extra(c)),
                                  lut.INSERT_EXTRA)
    np.testing.assert_array_equal(np.asarray(arith_lut.insert_base(c)),
                                  lut.INSERT_BASE)
    np.testing.assert_array_equal(np.asarray(arith_lut.copy_extra(c)),
                                  lut.COPY_EXTRA)
    np.testing.assert_array_equal(np.asarray(arith_lut.copy_base(c)),
                                  lut.COPY_BASE)


def test_split_command_all_codes():
    sym = jnp.arange(C.NUM_COMMAND_SYMBOLS, dtype=jnp.int32)
    ic, cc = arith_lut.split_command(sym)
    np.testing.assert_array_equal(np.asarray(ic), lut.CMD_INSERT_CODE[:704])
    np.testing.assert_array_equal(np.asarray(cc), lut.CMD_COPY_CODE[:704])
