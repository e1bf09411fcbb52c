"""Env package exports (reference: `gym/envs/dart/__init__.py` † — exposes
DartEnv + every env class; the reference guards `import pydart2` with a
DependencyNotInstalled hint, which has no analogue here since the engine is
part of this package)."""
from dartenv_tpu.envs.base import DartEnv, Task  # noqa: F401
from dartenv_tpu.envs.cart_pole import (  # noqa: F401
    DartCartPoleEnv, DartCartPoleSwingUpEnv,
)
from dartenv_tpu.envs.double_pendulum import (  # noqa: F401
    DartDoubleInvertedPendulumEnv,
)
from dartenv_tpu.envs.reacher import DartReacherEnv  # noqa: F401
from dartenv_tpu.envs.reacher2d import DartReacher2dEnv  # noqa: F401
from dartenv_tpu.envs.hopper import DartHopperEnv  # noqa: F401
from dartenv_tpu.envs.walker2d import DartWalker2dEnv  # noqa: F401
from dartenv_tpu.envs.walker3d import DartWalker3dEnv  # noqa: F401
from dartenv_tpu.envs.human_walker import DartHumanWalkerEnv  # noqa: F401
from dartenv_tpu.envs.snake_7link import DartSnake7LinkEnv  # noqa: F401
from dartenv_tpu.envs.dog import DartDogEnv  # noqa: F401
