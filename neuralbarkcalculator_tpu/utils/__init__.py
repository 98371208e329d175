from .profiling import (device_trace, print_report, report,  # noqa: F401
                        stage_timer)
