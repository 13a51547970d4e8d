"""In-graph RL: actor-critic nets + fully jitted PPO learner."""

from gym_multigrid_tpu.rl.networks import ActorCritic, sample_actions
from gym_multigrid_tpu.rl.ppo import PPOConfig, Transition, make_ppo

__all__ = ["ActorCritic", "sample_actions", "PPOConfig", "Transition", "make_ppo"]
