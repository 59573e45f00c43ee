"""Golden-policy behavioral tests (SURVEY.md §2.11 / §4): the pretrained
DAPG experts must succeed in our envs.

Control measurements on the mujoco-3.10 oracle (same policies, same
randomization protocol, 5 episodes):
  hammer 5/5, relocate 5/5, pen 2/5, door 0/5 (door's expert was trained
  at frame_skip 5; this reference snapshot deliberately runs door at
  frame_skip 1 — `door_v0.py:10` — which breaks the expert *in the
  reference too*, so door is excluded here).
Our env must reproduce the successes for hammer/relocate and partial
success for pen.
"""
import numpy as np
import pytest

from conftest import requires_reference

pytestmark = [requires_reference]


@pytest.mark.parametrize("task,min_success", [
    ("hammer", 0.5), ("relocate", 0.5), ("pen", 0.4)])
def test_dapg_expert_succeeds(task, min_success):
    import jax
    from mj_envs_tpu import envs
    from mj_envs_tpu.algos import dapg
    from mj_envs_tpu.utils.eval import make_evaluate, dapg_policy_apply

    env = envs.make(f"{task}-v0")
    act_fn, _ = dapg.load_policy(task)
    evaluate = make_evaluate(env, dapg_policy_apply(act_fn),
                             env.MAX_EPISODE_STEPS)
    res = evaluate(None, jax.random.PRNGKey(0), count=4)
    rate = res.success_rate / 100.0
    assert rate >= min_success, (
        f"{task}: DAPG expert success {rate:.0%} < {min_success:.0%}; "
        f"rewards {res.total_rewards}")


def test_dapg_policy_matches_numpy_forward():
    """The extracted JAX policy must equal a direct NumPy evaluation of
    the pickled weights (guards the tanh-vs-relu extraction bug)."""
    import jax.numpy as jnp
    from mj_envs_tpu.algos import dapg
    p = dapg.load_dapg_params(
        "/root/reference/mj_envs_vision/algos/dapg_pretrained/"
        "relocate-v0.pickle")
    assert p["nonlinearity"] == "tanh"
    act = dapg.make_policy(p, dtype=jnp.float64)
    rng = np.random.default_rng(0)
    for _ in range(5):
        obs = rng.normal(size=p["obs_dim"])
        x = (obs - p["in_shift"]) / (p["in_scale"] + 1e-8)
        for w, b in p["layers"][:-1]:
            x = np.tanh(x @ w.T + b)
        w, b = p["layers"][-1]
        ref = (x @ w.T + b) * p["out_scale"] + p["out_shift"]
        ours = np.asarray(act(jnp.asarray(obs)))
        assert np.max(np.abs(ours - ref)) < 1e-10
