from buzzdetect_tpu.runtime.coordination import Coordinator, ExitSignal, EXIT  # noqa: F401
from buzzdetect_tpu.runtime.assignments import (  # noqa: F401
    AssignFile, AssignChunk, AssignLog)
