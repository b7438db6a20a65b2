"""Named-warmup registry executed at server startup.

Analog of the reference's ``srt/warmup.py`` (``@warmup`` registry +
``--warmups`` flag): custom warmups pre-compile jit buckets / populate
caches before traffic arrives. A warmup receives the AsyncEngine and is
awaited during startup; unknown names log a warning and are skipped.

On TPU the built-in ``bucket_sweep`` warmup matters more than on GPU:
every (batch, seq, pages) bucket is a separate XLA compile (minutes per
shape through the remote-compile hop), so sweeping the common buckets at
boot moves those compiles out of the first requests' latency.
"""

from __future__ import annotations

import logging
from typing import Callable, Dict, List

logger = logging.getLogger(__name__)

_warmup_registry: Dict[str, Callable] = {}


def warmup(name: str) -> Callable:
    def decorator(fn: Callable) -> Callable:
        _warmup_registry[name] = fn
        return fn
    return decorator


async def execute_warmups(names: List[str], engine) -> None:
    for name in names:
        fn = _warmup_registry.get(name)
        if fn is None:
            logger.warning("unknown warmup %r (have: %s)",
                           name, sorted(_warmup_registry))
            continue
        logger.info("running warmup %r", name)
        await fn(engine)


@warmup("bucket_sweep")
async def bucket_sweep(engine) -> None:
    """Compile the common decode batch-size buckets by running that many
    concurrent tiny requests per bucket."""
    import asyncio

    sa = engine.server_args
    sp = {"max_new_tokens": 2, "temperature": 0.0}
    for n in sorted(set(sa.decode_bs_buckets))[:4]:
        await asyncio.gather(*[
            engine.generate(input_ids=[3, 5, 7 + i], sampling_params=sp,
                            rid=f"warmup-bucket-{n}-{i}")
            for i in range(n)
        ])


@warmup("long_prefill")
async def long_prefill(engine) -> None:
    """Compile the largest prefill token bucket (long-prompt serving)."""
    sa = engine.server_args
    vocab = engine.runner.model_config.vocab_size
    n = min(max(sa.prefill_token_buckets), 2048)
    await engine.generate(
        input_ids=[3 + (i % (vocab - 4)) for i in range(n)],
        sampling_params={"max_new_tokens": 2, "temperature": 0.0},
        rid="warmup-long-prefill",
    )
