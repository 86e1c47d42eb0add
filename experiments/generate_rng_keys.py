r"""Pre-generate a manifest of PRNG keys for reproducible MC repetitions
(reference ``experiments/generate_rng_keys.py``)."""
import jax
import numpy as np

keys = jax.random.split(jax.random.PRNGKey(666), 1000)
np.save("./keys.npy", np.asarray(keys))
print("Saved 1000 keys to ./keys.npy")
