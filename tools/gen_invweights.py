"""Pre-generate the invweight (mj_setConst) result files shipped as
package data under `mj_envs_tpu/assets/invweights/`.

`envs.make()` needs dof/body/tendon inverse weights at qpos0; computing
them is one jitted XLA program whose FRESH compile costs ~30 s on
XLA:CPU and was measured at 343 s through the axon TPU tunnel.  The
`.jax_cache/` result cache fixes reruns on one machine but is
gitignored; committing the tiny (<4 KB) result arrays keyed by the same
content hash makes cold-clone `envs.make()` sub-second on every machine.

Run on a CPU host after any change to the models or the invweight math
(bump `_INVWEIGHT_CACHE_VERSION` there):

    JAX_PLATFORMS=cpu python tools/gen_invweights.py
"""
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mj_envs_tpu.utils.hostcpu import pin_cpu      # noqa: E402
pin_cpu()

from mj_envs_tpu.mjcf import builder as B          # noqa: E402
from mj_envs_tpu.mjcf import task_xml_path    # noqa: E402

TASKS = ("hammer", "door", "pen", "relocate")
DTYPES = (np.float32, np.float64)


def main():
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "mj_envs_tpu", "assets", "invweights")
    os.makedirs(out_dir, exist_ok=True)
    for task in TASKS:
        for dtype in DTYPES:
            model = B.build_from_xml(task_xml_path(task), dtype=dtype)
            src = B._invweight_cache_path(model)
            assert os.path.exists(src), (task, dtype, src)
            dst = os.path.join(out_dir, os.path.basename(src))
            shutil.copyfile(src, dst)
            print(f"{task} {np.dtype(dtype).name}: {os.path.basename(dst)}")


if __name__ == "__main__":
    main()
