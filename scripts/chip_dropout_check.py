"""On-chip validation of the native-rank hw_dropout kernel (no pad/slice).

Checks, at the production LLM-MLP shape [6, 798, 4864] (whose 798 rows do
NOT divide the block -- exercises Mosaic boundary masking):
  1. rate=0 is exact identity;
  2. every output element is x * 1/(1-rate) or 0 (mask semantics);
  3. empirical drop rate within 1% absolute of the requested rate;
  4. fwd and bwd apply the IDENTICAL mask (the re-seeding VJP contract);
  5. rank-2 path still agrees with its own mask contract.

Usage: timeout 600 python scripts/chip_dropout_check.py
Prints one OK line per check; exits nonzero on failure.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["SIMLINGO_DROPOUT_V2"] = "1"

import jax
import jax.numpy as jnp
import numpy as np

from simlingo_tpu.kernels.dropout import hw_dropout, make_seed

seed = make_seed(jax.random.PRNGKey(7))
x = jax.random.normal(jax.random.PRNGKey(1), (6, 798, 4864), jnp.bfloat16)
x = jnp.where(x == 0, jnp.asarray(1e-3, x.dtype), x)  # no accidental zeros

# 1. identity at rate 0
y0 = jax.jit(lambda a: hw_dropout(a, seed, 0.0))(x)
np.testing.assert_array_equal(np.asarray(y0), np.asarray(x))
print("OK identity rate=0")

# 2/3. mask semantics + rate
rate = 0.1
y = jax.jit(lambda a: hw_dropout(a, seed, rate))(x)
yn = np.asarray(y, np.float32)
xn = np.asarray(x, np.float32)
scaled = xn * np.float32(1.0 / (1.0 - rate))
is_zero = yn == 0.0
is_scaled = np.isclose(yn, scaled, rtol=2e-2, atol=1e-6)
assert np.all(is_zero | is_scaled), \
    f"non-mask values: {np.sum(~(is_zero | is_scaled))}"
emp = is_zero.mean()
assert abs(emp - rate) < 0.01, f"drop rate {emp:.4f} vs {rate}"
print(f"OK mask semantics; empirical drop rate {emp:.4f}")

# 4. fwd/bwd mask identity: grad of sum(dropout(x)) is mask/keep, so
# grad * x == dropout(x) elementwise when masks match
g = jax.jit(jax.grad(lambda a: hw_dropout(a, seed, rate).astype(
    jnp.float32).sum()))(x)
np.testing.assert_array_equal(np.asarray(g) == 0, is_zero)
print("OK fwd/bwd mask identity")

# 5. rank-2, non-8-aligned rows
x2 = jax.random.normal(jax.random.PRNGKey(2), (4788, 512), jnp.bfloat16)
y2 = jax.jit(lambda a: hw_dropout(a, seed, rate))(x2)
y2n = np.asarray(y2, np.float32)
x2n = np.asarray(x2, np.float32) / (1.0 - rate)
ok = (y2n == 0) | np.isclose(y2n, x2n, rtol=2e-2, atol=1e-6)
assert np.all(ok), f"rank-2 non-mask values: {np.sum(~ok)}"
print(f"OK rank-2; drop rate {(y2n == 0).mean():.4f}")
print("ALL OK")
