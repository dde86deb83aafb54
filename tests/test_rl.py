"""RL stack: HER buffer semantics, learner updates, QP/NEO, ensemble fusion."""
import json
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from panda_gym_tpu.rl import her
from panda_gym_tpu.rl.config import Hyperparameters
from panda_gym_tpu.rl.learners import make_learner


def test_her_buffer_roundtrip_and_relabel():
    buf = her.create(capacity_episodes=8, ep_horizon=5, obs_dim=2,
                     goal_dim=3, act_dim=2, aux_dim=0)
    B, T = 4, 5
    achieved = jnp.arange(B * (T + 1) * 3, dtype=jnp.float32).reshape(B, T + 1, 3)
    episodes = dict(
        obs=jnp.zeros((B, T + 1, 2)), achieved=achieved,
        desired=jnp.full((B, 3), -1.0), action=jnp.zeros((B, T, 2)),
        aux=jnp.zeros((B, T, 0)), ep_len=jnp.full((B,), T, jnp.int32),
        terminated=jnp.zeros((B, T), bool))
    buf = her.add_episodes(buf, **episodes)
    assert int(buf.n_stored) == 4

    def reward_fn(ach_next, goal, aux):
        return -jnp.linalg.norm(ach_next - goal, axis=-1)

    batch = her.sample(buf, jax.random.PRNGKey(0), 128, reward_fn,
                       her_ratio=1.0)
    # with her_ratio 1, every goal must be an achieved state from the same
    # episode at a later time -> goal must appear in that episode's achieved
    goals = np.asarray(batch["goal"])
    ach = np.asarray(buf.achieved[:4]).reshape(-1, 3)
    for g in goals[:16]:
        assert (np.abs(ach - g).sum(-1) < 1e-5).any(), g

    batch0 = her.sample(buf, jax.random.PRNGKey(1), 128, reward_fn,
                        her_ratio=0.0)
    np.testing.assert_allclose(np.asarray(batch0["goal"]),
                               np.full((128, 3), -1.0))


def test_her_ring_overwrite():
    buf = her.create(4, 3, 1, 1, 1, 0)
    eps = dict(obs=jnp.ones((3, 4, 1)), achieved=jnp.ones((3, 4, 1)),
               desired=jnp.ones((3, 1)), action=jnp.ones((3, 3, 1)),
               aux=jnp.zeros((3, 3, 0)), ep_len=jnp.full((3,), 3, jnp.int32),
               terminated=jnp.zeros((3, 3), bool))
    buf = her.add_episodes(buf, **eps)
    buf = her.add_episodes(buf, **eps)
    assert int(buf.n_stored) == 4
    assert int(buf.write_idx) == 2


@pytest.mark.parametrize("algo", ["SAC", "TQC", "TD3", "DDPG"])
def test_learner_update_and_act(algo):
    hp = Hyperparameters("TQC" if algo in ("SAC",) else algo)
    L = make_learner(algo, 6, 3, hp)
    ts = L.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (32, 6))
    batch = dict(x=x, x2=x, action=jnp.zeros((32, 3)),
                 reward=-jnp.ones(32), terminated=jnp.zeros(32))
    ts2, m = jax.jit(L.update)(ts, batch, jax.random.PRNGKey(2))
    assert np.isfinite(m["critic_loss"])
    assert int(ts2.step) == 1
    a = L.act(ts2, x, jax.random.PRNGKey(3))
    assert a.shape == (32, 3)
    assert (np.abs(np.asarray(a)) <= 1.0 + 1e-5).all()


def test_learner_gamma0_regression():
    """With gamma=0 the critic must regress to the rewards."""
    hp = Hyperparameters("TQC")
    hp.gamma = 0.0
    L = make_learner("TQC", 4, 2, hp)
    ts = L.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(2), (256, 4))
    a = jax.random.uniform(jax.random.PRNGKey(3), (256, 2), minval=-1, maxval=1)
    r = -jnp.sum(x[:, :2] ** 2, -1)
    batch = dict(x=x, x2=x, action=a, reward=r, terminated=jnp.ones(256))
    upd = jax.jit(L.update)
    key = jax.random.PRNGKey(1)
    for _ in range(300):
        key, k = jax.random.split(key)
        ts, m = upd(ts, batch, k)
    q = L.critic.apply(ts.critic_params, x, a).mean(axis=(0, 2))
    assert float(jnp.mean(jnp.abs(q - r))) < 0.3


def test_qp_solver():
    from panda_gym_tpu.ops.qp import solve_qp_admm
    Q = jnp.eye(2)
    x, _ = solve_qp_admm(Q, jnp.array([-1.0, -2.0]), jnp.eye(2),
                         jnp.zeros(2), jnp.ones(2))
    np.testing.assert_allclose(np.asarray(x), [1, 1], atol=1e-3)
    x, _ = solve_qp_admm(Q, jnp.zeros(2), jnp.array([[1.0, 1.0]]),
                         jnp.ones(1), jnp.ones(1))
    np.testing.assert_allclose(np.asarray(x), [0.5, 0.5], atol=1e-3)


def test_neo_prior_moves_toward_goal():
    from panda_gym_tpu.envs.tasks.reach_ao import make_reach_ao_core
    from panda_gym_tpu.ops.neo import compute_action_neo
    import panda_gym_tpu.ops.kinematics as K

    core = make_reach_ao_core("reachao1")
    st, _ = core.reset(jax.random.PRNGKey(0))
    fk = K.fk_world(core.model, st.q, st.qd)
    qd = compute_action_neo(core.model, core.robot.ee_site, st, fk, st.goal)
    ee = K.site_com_position(core.model, fk, core.robot.ee_site)
    Jv, _ = K.point_jacobian(core.model, fk, ee,
                             core.model.site_body_tuple[core.robot.ee_site])
    v = Jv[:, :7] @ qd
    d = (st.goal - ee) / jnp.linalg.norm(st.goal - ee)
    assert float(v @ d) > 0.02  # EE heads toward the goal
    # joint velocity limits respected (QP bounds, panda.py:417-419)
    from panda_gym_tpu.models import panda_constants as pc
    assert (np.abs(np.asarray(qd)) <= pc.QDLIM + 1e-3).all()


def test_ensemble_fusion():
    from panda_gym_tpu.eval import ensemble as F
    means = jnp.array([[1.0, 0.0], [0.0, 1.0]])
    vars_ = jnp.array([[0.1, 0.1], [10.0, 10.0]])
    np.testing.assert_allclose(np.asarray(F.mean(means)), [0.5, 0.5])
    w = F.weighted_aggregation(vars_, means)
    assert w[0] > 0.9  # low-variance member dominates
    a, idx = F.confidence(means, vars_)
    assert int(idx) == 0
    mu, sigma = F.fuse_controllers(jnp.zeros(2), 1.0, jnp.ones(2), 1.0)
    np.testing.assert_allclose(np.asarray(mu), [0.5, 0.5])


@pytest.mark.slow
def test_trainer_smoke():
    """Tiny end-to-end Trainer run (2 rollouts, Reach)."""
    from panda_gym_tpu.rl.config import TrainConfig
    from panda_gym_tpu.rl.train import Trainer
    from panda_gym_tpu.envs.panda_tasks import make_reach_core

    cfg = TrainConfig()
    cfg.n_envs = 4
    cfg.stages = ["s0"]
    cfg.success_thresholds = [2.0]
    cfg.max_ep_steps = [5]
    cfg.ee_error_thresholds = [0.05]
    cfg.max_timesteps = 40
    cfg.learning_starts = 10
    cfg.eval_freq = 1000

    tr = Trainer(cfg, lambda s, e, sp: make_reach_core(reward_type="dense"))
    tr.learn(seed=0)
    assert tr.timesteps >= 40
    assert any("rollout_success" in r for r in tr.metrics.history)


@pytest.mark.slow
def test_trainer_save_resume(tmp_path):
    """Full checkpoint-resume: learner + buffer + step counter survive a
    save/load round trip and training continues (continue_learning,
    setup_training.py:383-422)."""
    from panda_gym_tpu.envs.panda_tasks import make_reach_core
    from panda_gym_tpu.rl.config import TrainConfig
    from panda_gym_tpu.rl.train import Trainer

    cfg = TrainConfig()
    cfg.n_envs = 4
    cfg.stages = ["s0"]
    cfg.success_thresholds = [2.0]
    cfg.max_ep_steps = [5]
    cfg.ee_error_thresholds = [0.05]
    cfg.max_timesteps = 40
    cfg.learning_starts = 10
    cfg.eval_freq = 1000

    mk = lambda s, e, sp: make_reach_core(reward_type="dense")
    tr = Trainer(cfg, mk)
    tr.learn(seed=0)
    path = str(tmp_path / "ckpt.pkl")
    tr.save(path, include_buffer=True)

    tr2 = Trainer(cfg, mk)
    tr2.load(path)
    assert tr2.timesteps == tr.timesteps
    before = tr2.timesteps
    tr2.learn(seed=1)
    assert tr2.timesteps > before
    leaves1 = jax.tree_util.tree_leaves(tr.ts.actor_params)
    leaves2 = jax.tree_util.tree_leaves(tr2.ts.actor_params)
    assert all(l1.shape == l2.shape for l1, l2 in zip(leaves1, leaves2))

    # restore_buffer=False: learner restored, replay starts fresh (matches
    # continue_learning — its buffer reload is commented out,
    # setup_training.py:80-82)
    tr3 = Trainer(cfg, mk)
    tr3.load(path, restore_buffer=False)
    assert tr3.buffer is None and tr3.timesteps == tr.timesteps
    tr3.learn(seed=2)
    assert tr3.buffer is not None


def test_ppo_smoke():
    """PPO learner end-to-end: rollout collection with auto-reset + timeout
    bootstrap, GAE, clipped-surrogate minibatch epochs."""
    from panda_gym_tpu.envs.panda_tasks import make_reach_core
    from panda_gym_tpu.rl.config import Hyperparameters
    from panda_gym_tpu.rl.ppo import train_ppo

    core = make_reach_core(reward_type="dense")
    hp = Hyperparameters("PPO")
    hp.n_steps = 8
    hp.n_epochs = 2
    hp.batch_size = 16
    learner, ts, hist = train_ppo(core, hp, total_steps=2 * 8 * 4, n_envs=4,
                                  seed=0, max_episode_steps=10)
    assert len(hist) == 2
    for m in hist:
        for k, v in m.items():
            assert np.isfinite(v), (k, v)


def test_sweep_sampling_and_driver(tmp_path):
    """Sweep spec sampling (uniform/int/categorical x random/halton/grid) and
    the driver's scoring/failure handling."""
    from panda_gym_tpu.rl import sweep as sw

    space = {"lr": sw.Uniform(1e-4, 1e-2, log=True),
             "bs": sw.IntUniform(64, 512),
             "arch": sw.Categorical(((256,), (256, 256)))}
    for method in ("random", "halton", "grid"):
        cfgs = sw.sample_configs(space, 5, method)
        assert len(cfgs) >= 1
        for c in cfgs:
            assert 1e-4 <= c["lr"] <= 1e-2
            assert 64 <= c["bs"] <= 512
            assert c["arch"] in ((256,), (256, 256))

    calls = []
    def fake_train(cfg, seed):
        calls.append(cfg)
        if len(calls) == 2:
            raise RuntimeError("diverged")
        return {"global_step": 1000.0 * len(calls)}

    trials = sw.run_sweep(fake_train, space, n_trials=3,
                          out_path=str(tmp_path / "s.jsonl"))
    assert len(trials) == 3
    assert trials[0]["metrics"]["global_step"] == 1000.0  # best first
    assert any("error" in t["metrics"] for t in trials)   # failure recorded


def test_imitation_prior_fill():
    """fill_buffer_with_prior writes NEO-prior episodes into the HER buffer
    (imitation_learning.py:6-56 equivalent)."""
    from panda_gym_tpu.envs.panda_tasks import make_reach_core
    from panda_gym_tpu.rl.imitation import fill_buffer_with_prior
    from panda_gym_tpu.rl.train import VectorEnv

    core = make_reach_core(control_type="js")
    venv = VectorEnv(core, n_envs=4, horizon=8)
    aux_dim = int(jax.eval_shape(
        lambda s: core.task.reward_aux(core, s), core._template).shape[0])
    buf = her.create(16, venv.horizon, venv.obs_dim, venv.goal_dim,
                     venv.act_dim, aux_dim)
    buf, stats = fill_buffer_with_prior(venv, buf, jax.random.PRNGKey(0),
                                        n_rollouts=2)
    assert int(buf.n_stored) == 8  # 2 rollouts x 4 envs
    # stored episodes contain non-trivial actions and finite obs
    assert float(jnp.abs(buf.action[:8]).max()) > 1e-4
    assert bool(jnp.isfinite(buf.obs[:8]).all())


def test_sweep_sampling_methods():
    from panda_gym_tpu.rl import sweep as S

    space = {
        "learning_rate": S.Uniform(1e-4, 1e-2, log=True),
        "batch_size": S.Categorical((128, 256, 512)),
        "tau": S.Uniform(0.005, 0.05),
    }
    for method in ("halton", "random", "grid"):
        cfgs = S.sample_configs(space, 9, method=method, seed=1)
        assert len(cfgs) == 9
        for c in cfgs:
            assert 1e-4 <= c["learning_rate"] <= 1e-2
            assert c["batch_size"] in (128, 256, 512)
            assert 0.005 <= c["tau"] <= 0.05
    # halton is deterministic
    a = S.sample_configs(space, 5, method="halton")
    b = S.sample_configs(space, 5, method="halton")
    assert a == b


def test_final_stage_benchmark_evals(tmp_path):
    """Final curriculum stage evaluates the configured benchmark scenes and
    snapshots a best model per scene (setup_training.py:255-290)."""
    import os

    from panda_gym_tpu.envs.tasks.reach_ao import make_reach_ao_core
    from panda_gym_tpu.rl.config import TrainConfig
    from panda_gym_tpu.rl.logging_utils import RunLogger
    from panda_gym_tpu.rl.train import Trainer

    cfg = TrainConfig()
    cfg.n_envs = 4
    cfg.stages = ["reachao1"]
    cfg.success_thresholds = [2.0]
    cfg.max_ep_steps = [5]
    cfg.ee_error_thresholds = [0.05]
    cfg.max_timesteps = 60
    cfg.learning_starts = 10
    cfg.eval_freq = 20
    cfg.n_eval_episodes = 4
    cfg.benchmark_eval_scenes = ["wall"]

    logger = RunLogger(group="t", name="bench_eval", root=str(tmp_path))
    mk = lambda s, e, sp: make_reach_ao_core(scenario=s, config=cfg,
                                             ee_error_threshold=e,
                                             speed_threshold=sp)
    tr = Trainer(cfg, mk, logger=logger)
    tr.learn(seed=0)
    logger.close()
    assert os.path.exists(os.path.join(logger.dir, "best_model_wall.ckpt"))
    rows = [json.loads(l) for l in open(
        os.path.join(logger.dir, "metrics.jsonl"))]
    assert any("wall_eval_success" in r for r in rows)


def test_load_run_prefers_best_model(tmp_path):
    """load_run returns the evaluation checkpoint last: best_model.ckpt when
    present (the reference's loader resolves best_model.zip,
    load_model_utils.py:14-50), else final.ckpt; per-scene best_model_<scene>
    eval artifacts never appear in the stage list."""
    import os

    from panda_gym_tpu.rl.logging_utils import load_run

    run = tmp_path / "run"
    run.mkdir()
    (run / "config.json").write_text("{}")
    for f in ["model_reachao1_0.ckpt", "final.ckpt", "best_model_wall.ckpt"]:
        (run / f).write_bytes(b"x")
    _, ckpts = load_run(str(run))
    names = [os.path.basename(p) for p in ckpts]
    assert names == ["model_reachao1_0.ckpt", "final.ckpt"]

    (run / "best_model.ckpt").write_bytes(b"x")
    _, ckpts = load_run(str(run))
    names = [os.path.basename(p) for p in ckpts]
    assert names[-1] == "best_model.ckpt"
    assert "best_model_wall.ckpt" not in names


def test_run_config_roundtrips_obs_max_distance(tmp_path):
    """task_observations (incl. the obs distance cap) must survive the
    config.json round trip so benchmark/eval envs rebuild identically
    (the reference's W&B-YAML -> TrainConfig loader contract,
    load_model_utils.py:43-50)."""
    from panda_gym_tpu.rl.config import TrainConfig
    from panda_gym_tpu.rl.logging_utils import RunLogger, load_run

    cfg = TrainConfig()
    cfg.task_observations = dict(cfg.task_observations, max_distance=2.0)
    logger = RunLogger(root=str(tmp_path), group="g", name="r", config=cfg)
    logger.close() if hasattr(logger, "close") else None
    cfg2, ckpts = load_run(str(tmp_path / "g" / "r"))
    assert cfg2.task_observations["max_distance"] == 2.0
    assert ckpts == []


def test_summarize_campaign_mixture_claims(tmp_path):
    """The campaign summarizer must (a) let a mixture-trained run ('a+b'
    stages, incl. _rs/_hN/_pNN curriculum-variant suffixes) claim each
    component scene, and (b) pick the widest benchmark as the scene list —
    a single-scene fine-tune sorting first must not collapse the table."""
    import json
    import sys
    sys.path.insert(0, "tools")
    from summarize_campaign import summarize

    def write_run(name, stages, bench):
        d = tmp_path / name
        d.mkdir()
        (d / "config.json").write_text(json.dumps({"stages": stages}))
        (d / "benchmark.json").write_text(json.dumps(
            {s: {"success_rate": v, "collision_rate": 0.0}
             for s, v in bench.items()}))

    # sorts FIRST and covers one scene — must not define the scene list
    write_run("a_specialist", ["wall"], {"wall": 0.9})
    # mixture generalist over both scenes (with a variant suffix)
    write_run("gen", ["tunnel_rs+wall_h22"], {"wall": 0.5, "tunnel": 0.8})

    summary = summarize(str(tmp_path))
    assert set(summary) == {"wall", "tunnel"}
    # specialist claims wall via its stage; generalist claims tunnel
    assert summary["wall"]["best_model"] == "a_specialist"
    assert summary["wall"]["best_success"] == 0.9
    assert summary["tunnel"]["best_model"] == "gen"
    # the generalist column is the full-coverage run
    assert summary["wall"]["base_success"] == 0.5


def test_stage_tag_long_mixture_names():
    """Per-stage snapshot filenames must survive arbitrarily long mixture
    stage names (a 23-scene '+'-joined name broke the 255-byte filename
    limit in the wild); short names pass through untouched."""
    from panda_gym_tpu.rl.train import stage_tag

    assert stage_tag("reachao1") == "reachao1"
    long = "+".join(["reachao_rand_start"] * 20)
    tag = stage_tag(long)
    assert len(f"model_{tag}_0.ckpt") < 160
    # unique per distinct name
    assert tag != stage_tag(long + "+wall")
    assert tag == stage_tag(long)


def test_run_config_roundtrips_net_arch(tmp_path):
    """Hyperparameter overrides (e.g. --net-arch) must survive the
    config.json round trip so evaluate.py rebuilds the exact network a
    checkpoint was trained with — loading a [512,512] policy into the
    preset's [256,256] net would fail or silently mis-evaluate."""
    from panda_gym_tpu.rl.config import Hyperparameters, TrainConfig
    from panda_gym_tpu.rl.logging_utils import RunLogger, load_run

    cfg = TrainConfig()
    cfg.hyperparams = Hyperparameters("TQC")
    cfg.hyperparams.policy_kwargs = dict(
        cfg.hyperparams.policy_kwargs, net_arch=[512, 512])
    RunLogger(root=str(tmp_path), group="g", name="r", config=cfg).close()
    cfg2, _ = load_run(str(tmp_path / "g" / "r"))
    assert isinstance(cfg2.hyperparams, Hyperparameters)
    assert cfg2.hyperparams.policy_kwargs["net_arch"] == [512, 512]
    # untouched preset fields come back too
    assert cfg2.hyperparams.n_quantiles == 25

    # configs written before hyperparams serialization (no key) fall back
    # to the algorithm preset
    import json
    cfg_path = tmp_path / "g" / "r" / "config.json"
    raw = json.loads(cfg_path.read_text())
    raw.pop("hyperparams")
    cfg_path.write_text(json.dumps(raw))
    cfg3, _ = load_run(str(tmp_path / "g" / "r"))
    assert cfg3.hyperparams.policy_kwargs["net_arch"] == [256, 256]


@pytest.mark.slow
def test_trainer_classic_contact_task_smoke():
    """Trainer over a contact task (Push) — the tools/train_classic.py path:
    HER relabeling through _GoalTask.reward_from_aux with object physics in
    the loop (reference trains classic tasks via SB3+HER, README upstream)."""
    from panda_gym_tpu.rl.config import TrainConfig
    from panda_gym_tpu.rl.train import Trainer
    from panda_gym_tpu.envs.panda_tasks import make_core

    cfg = TrainConfig()
    cfg.n_envs = 4
    cfg.stages = ["push"]
    cfg.success_thresholds = [2.0]
    cfg.max_ep_steps = [5]
    cfg.ee_error_thresholds = [0.05]
    cfg.max_timesteps = 40
    cfg.learning_starts = 10
    cfg.eval_freq = 1000
    cfg.benchmark_eval_scenes = []

    tr = Trainer(cfg, lambda task, e, sp: make_core(task))
    tr.learn(seed=0)
    assert tr.timesteps >= 40
    assert any("rollout_success" in r for r in tr.metrics.history)


def test_gsde_state_dependent_noise():
    """True gSDE (reference presets: use_sde=True, log_std_init=-3,
    hyperparameters.py:19-27): exploration noise is a deterministic function
    of the state given the per-episode exploration matrix — same state =>
    same action within an episode, different states => different noise —
    and the actor carries the (latent_dim, act_dim) log_std parameter."""
    import jax
    import jax.numpy as jnp

    from panda_gym_tpu.rl.config import Hyperparameters
    from panda_gym_tpu.rl.learners import ckpt_uses_sde, make_learner

    hp = Hyperparameters("TQC")
    assert hp.use_sde is True
    L = make_learner("TQC", 12, 4, hp)
    ts = L.init(jax.random.PRNGKey(0))
    assert ckpt_uses_sde(ts)
    log_std = ts.actor_params["params"]["log_std_sde"]
    assert log_std.shape == (256, 4)
    np.testing.assert_allclose(np.asarray(log_std), -3.0)

    x = jnp.linspace(-1, 1, 3 * 12).reshape(3, 12)
    expl = L.sample_expl(ts, jax.random.PRNGKey(1), 3)
    assert expl.shape == (3, 256, 4)
    # same expl + same state -> identical action regardless of the step key
    a1 = L.act(ts, x, jax.random.PRNGKey(2), expl=expl)
    a2 = L.act(ts, x, jax.random.PRNGKey(99), expl=expl)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2))
    # noise is nonzero and state-dependent
    det = L.act(ts, x, jax.random.PRNGKey(2), deterministic=True)
    noise = np.asarray(a1) - np.asarray(det)
    assert np.abs(noise).max() > 1e-4
    assert not np.allclose(noise[0], noise[1])
    # update works with the SDE actor (reparameterized log-prob path)
    batch = dict(x=jnp.ones((8, 12)), x2=jnp.ones((8, 12)),
                 action=jnp.zeros((8, 4)), reward=jnp.zeros(8),
                 terminated=jnp.zeros(8))
    ts2, m = L.update(ts, batch, jax.random.PRNGKey(3))
    assert np.isfinite(m["critic_loss"])


def test_legacy_ckpt_sde_alignment():
    """Pre-gSDE checkpoints (legacy Gaussian actor under use_sde=True
    configs) must keep loading: align_sde_with_ckpt flips hp.use_sde to
    match the checkpoint's parameter tree."""
    import jax

    from panda_gym_tpu.rl.config import Hyperparameters
    from panda_gym_tpu.rl.learners import align_sde_with_ckpt, make_learner

    hp_old = Hyperparameters("TQC")
    hp_old.use_sde = False  # how the legacy remap effectively built actors
    L_old = make_learner("TQC", 12, 4, hp_old)
    ts_old = L_old.init(jax.random.PRNGKey(0))

    hp = Hyperparameters("TQC")
    assert hp.use_sde is True
    align_sde_with_ckpt(hp, ts_old)
    assert hp.use_sde is False
    L = make_learner("TQC", 12, 4, hp)
    # the rebuilt learner can act with the old parameter tree
    a = L.act(ts_old, jnp.ones((2, 12)), jax.random.PRNGKey(1))
    assert a.shape == (2, 4)
