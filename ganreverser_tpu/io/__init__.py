from .checkpoint import (adversarial_name, exists, g_pretrained_name,
                         load_checkpoint, pretrained_name, r_name,
                         save_checkpoint, save_checkpoint_async,
                         wait_for_saves)
from .metrics import MetricsWriter, StepTimer, nan_guard, profiler_trace
from .preemption import PreemptionGuard
from .serving import (export_serving_program, load_serving_program,
                      save_serving_program)
