"""Small shared helpers (reference helpers.py)."""
import logging
import os
import sys


def print_args(args):
    command_str = f"python {sys.argv[0]} "
    for k, v in vars(args).items():
        command_str += f"\\\n\t {k}={v}"
    logging.info(command_str)


def select_platform(args=None):
    """Honor JAX_PLATFORMS / --device before any backend initialises.

    Some environments pin jax_platforms at the config level (e.g. via a
    sitecustomize hook), which silently overrides the JAX_PLATFORMS env
    var; apply the user's choice at the same level. Must run before the
    first jax computation. No-op once backends exist."""
    import jax

    want_cpu = os.environ.get("JAX_PLATFORMS") == "cpu" or getattr(
        args, "device", None
    ) == "cpu"
    if not want_cpu:
        return  # default platform order already prefers the accelerator
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception as e:  # backends already initialised
        logging.debug(f"platform override skipped: {e}")
