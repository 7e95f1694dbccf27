"""``save`` subcommand (reference ``scripts/save.py:26-54`` parity):
restore the latest training checkpoint and save inference variables
(params + batch_stats) as a standalone orbax artifact, then reload-check.
"""

from __future__ import annotations

import logging
import os

import jax

from tensorflowasr_tpu.scripts import common
from tensorflowasr_tpu.scripts.test import _load_variables

logger = logging.getLogger("tensorflowasr_tpu")


def main(args):
    import orbax.checkpoint as ocp

    config = common.load_config(args, training=False)
    tokenizer = common.build_tokenizer(config)
    model = common.build_model_from_config(config, tokenizer, mxp="none")
    variables = _load_variables(model, tokenizer, args)

    output = os.path.abspath(args.output)
    # hold + close the checkpointer: a bare temporary can be GC'd while its
    # async commit is still writing metadata ("futures after shutdown")
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(output, jax.device_get(variables))
        # reload check (reference does save → load_weights verification)
        restored = ckptr.restore(output, jax.device_get(variables))
    n = len(jax.tree_util.tree_leaves(restored))
    logger.info("saved + verified %d arrays at %s", n, output)
    return 0
