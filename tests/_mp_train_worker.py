"""Worker for the REAL two-process pod-path test (test_parallel.py).

Run as: python tests/_mp_train_worker.py <process_id> <port>
Forms a 2-process x 4-device virtual CPU cluster via jax.distributed +
gloo, feeds only this process's LOCAL half of a deterministic global
batch through the normal Trainer pipeline (shard_batch assembles the
global array), runs ONE train step, and prints the loss.
"""

import os
import sys

pid, port = int(sys.argv[1]), sys.argv[2]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from test_parallel import _tiny_transducer, _tp_batch  # noqa: E402

from tensorflowasr_tpu.optimizers import build_optimizer  # noqa: E402
from tensorflowasr_tpu.training import Trainer  # noqa: E402

model = _tiny_transducer()
global_batch = _tp_batch(8, identical_rows=False)
# this process feeds ONLY its local rows; shard_batch reassembles globally
local = jax.tree.map(lambda x: x[pid * 4 : (pid + 1) * 4], global_batch)

tx = build_optimizer({"class_name": "SGD", "config": {"learning_rate": 1e-2}})
trainer = Trainer(model, tx)
state = trainer.init_state(global_batch, seed=5)
state, metrics = trainer.train_step(state, local)
print(f"MP_LOSS {pid} {float(metrics['loss']):.8f}", flush=True)
