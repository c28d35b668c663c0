from .base import EnvState, GeecoEnv, ResetSpec, make_env

# reference-compatible aliases (src/geeco_gym/__init__.py:1-2)
PickAndPlaceEnv = GeecoEnv
PushingEnv = GeecoEnv
