"""CLI entrypoint: ``python -m sglang_fluentllm_tpu.launch_server --model-path ...``

Analog of the reference's ``launch_server.py:12-19``.
"""

import argparse
import os
import sys

from sglang_fluentllm_tpu.config.server_args import ServerArgs
from sglang_fluentllm_tpu.entrypoints.http_server import launch_server


def _apply_platform_choice(device: str):
    """Honor --device / JAX_PLATFORMS=cpu. Environment TPU plugins may
    force-select themselves via jax.config at interpreter start, so the
    env var alone is not enough — re-apply through jax.config."""
    want_cpu = device == "cpu" or os.environ.get("JAX_PLATFORMS") == "cpu"
    if want_cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="sglang_fluentllm_tpu serving engine"
    )
    parser.add_argument("--config", type=str, default=None,
                        help="YAML config file (flags override)")
    ServerArgs.add_cli_args(parser)
    args = parser.parse_args(argv)
    if args.config:
        server_args = ServerArgs.from_yaml(args.config)
    else:
        server_args = ServerArgs.from_cli_args(args)
    _apply_platform_choice(server_args.device)
    launch_server(server_args)


if __name__ == "__main__":
    main(sys.argv[1:])
