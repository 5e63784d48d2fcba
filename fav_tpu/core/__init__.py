from fav_tpu.core.trust import TrustState, TrustEngine, trust_step, initial_trust_state  # noqa: F401
from fav_tpu.core.attribution import FailureAttributor  # noqa: F401
from fav_tpu.core.policy_replay import grid_policy, replay_policy  # noqa: F401
from fav_tpu.core.session_log import SessionLogger  # noqa: F401
