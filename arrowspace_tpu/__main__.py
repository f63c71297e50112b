"""`python -m arrowspace_tpu` — analogue of the reference's trivial
binary (src/main.rs: init logging and exit)."""

import jax

from . import __version__, init

init()
print(f"arrowspace-tpu {__version__} — backend: {jax.default_backend()}, "
      f"devices: {len(jax.devices())}")
