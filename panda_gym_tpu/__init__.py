"""panda_gym_tpu — TPU-native goal-conditioned Franka Panda environments.

A from-scratch JAX/XLA re-implementation of the capabilities of
RaikoPipe/panda-gym (goal-conditioned PyBullet robot envs + obstacle
avoidance + curriculum RL), designed TPU-first: pure-functional env cores
under jit/vmap, device-mesh sharding for the env batch axis, and a Flax
learner stack.

Registration mirrors the reference's explicit style (panda_gym/__init__.py:
15-91): envs are registered by calling register_envs(max_ep_steps) /
register_reach_ao(max_ep_steps), NOT at import — callers re-register to
change the episode budget per curriculum stage (setup_training.py:250).
"""
__version__ = "0.1.0"


def register_reach_ao(max_ep_steps: int = 50) -> None:
    """reference panda_gym/__init__.py:15-20."""
    from gymnasium.envs.registration import register, registry

    if "PandaReachAO-v3" in registry:
        del registry["PandaReachAO-v3"]
    register(
        id="PandaReachAO-v3",
        entry_point="panda_gym_tpu.envs.tasks.reach_ao:PandaReachAOEnv",
        vector_entry_point="panda_gym_tpu.envs.vector_adapter:make_vector_env",
        kwargs={"vector_task": "reachao"},
        max_episode_steps=max_ep_steps,
    )


def register_envs(max_ep_steps: int = 50) -> None:
    """reference panda_gym/__init__.py:23-91."""
    from gymnasium.envs.registration import register, registry

    ids = []
    for reward_type in ["sparse", "dense"]:
        for control_type in ["ee", "joints"]:
            reward_suffix = "Dense" if reward_type == "dense" else ""
            control_suffix = "Joints" if control_type == "joints" else ""
            # the reference maps "joints" -> robot control_type "js"
            kwargs = {"reward_type": reward_type,
                      "control_type": "js" if control_type == "joints" else "ee"}
            for name, entry, vector_task in [
                ("PandaReach", "panda_gym_tpu.envs.panda_tasks:PandaReachEnv", "reach"),
                ("PandaReachChecker", "panda_gym_tpu.envs.panda_tasks:PandaReachCheckerEnv", "reach"),
                ("PandaPush", "panda_gym_tpu.envs.panda_tasks:PandaPushEnv", "push"),
                ("PandaSlide", "panda_gym_tpu.envs.panda_tasks:PandaSlideEnv", "slide"),
                ("PandaPickAndPlace", "panda_gym_tpu.envs.panda_tasks:PandaPickAndPlaceEnv", "pickandplace"),
                ("PandaStack", "panda_gym_tpu.envs.panda_tasks:PandaStackEnv", "stack"),
                ("PandaFlip", "panda_gym_tpu.envs.panda_tasks:PandaFlipEnv", "flip"),
                ("MyCobotReach", "panda_gym_tpu.envs.panda_tasks:MyCobotReachEnv", "mycobotreach"),
            ]:
                ver = "v0" if name == "MyCobotReach" else "v3"  # __init__.py:38-44
                env_id = f"{name}{control_suffix}{reward_suffix}-{ver}"
                if env_id in registry:
                    del registry[env_id]
                # vector_entry_point: gym.make_vec(id, num_envs=N) serves the
                # batch from ONE jitted step (envs/vector_adapter.py) — the
                # SubprocVecEnv replacement on the public gym surface
                register(id=env_id, entry_point=entry,
                         vector_entry_point=(
                             "panda_gym_tpu.envs.vector_adapter:make_vector_env"),
                         kwargs=dict(kwargs, vector_task=vector_task),
                         max_episode_steps=max_ep_steps)
                ids.append(env_id)
    register_reach_ao(max_ep_steps)
    return ids
