"""Named-stage wall-clock timer — same API as the reference's
``Common::Timer`` (``timer.h:13-33``, ``timer.cpp:5-75``): re-entrant
start/stop accumulation per stage in milliseconds, ``stage_timed_call``,
``get_stage_time``, ``print_results``.

On an async backend wall-clock around a dispatch measures nothing, so
``stage_timed_call`` fences with ``jax.block_until_ready`` on the
callable's result (the TPU analog of the reference's implicit
``cudaDeviceSynchronize`` via D2H copies)."""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict


@dataclass
class StageProperties:
    """Mirrors ``timer.h:6-11``."""

    is_running: bool = False
    begin: float = 0.0
    milliseconds_elapsed: float = 0.0


@dataclass
class Timer:
    timer_name: str = "Timer"
    stages: Dict[str, StageProperties] = field(default_factory=dict)

    def add_stage(self, name: str) -> StageProperties:
        self.stages.setdefault(name, StageProperties())
        return self.stages[name]

    def start_stage(self, name: str) -> None:
        stage = self.add_stage(name)
        if not stage.is_running:
            stage.is_running = True
            stage.begin = time.perf_counter()

    def stop_stage(self, name: str) -> None:
        stage = self.stages.get(name)
        if stage is not None and stage.is_running:
            stage.is_running = False
            stage.milliseconds_elapsed += (
                time.perf_counter() - stage.begin
            ) * 1000.0

    def stage_timed_call(self, name: str, func: Callable[[], Any]) -> Any:
        """Run ``func`` under the stage clock, fencing device async work."""
        import jax

        self.start_stage(name)
        try:
            result = func()
            jax.block_until_ready(result)
        finally:
            self.stop_stage(name)
        return result

    def get_stage_time(self, name: str) -> int:
        """Accumulated whole milliseconds (the reference returns
        ``long long`` ms, ``timer.cpp:44-52``)."""
        stage = self.stages.get(name)
        return int(stage.milliseconds_elapsed) if stage else 0

    def profiled(self, log_dir: str):
        """Context manager wrapping ``jax.profiler.trace`` — the TPU
        analog of the reference's Nsight-style stream inspection
        (``documentation.tex:192``); view with TensorBoard/XProf."""
        import jax

        return jax.profiler.trace(log_dir)

    def print_results(self) -> str:
        lines = [f"{self.timer_name} results:"]
        for name, stage in self.stages.items():
            lines.append(f"  {name}: {int(stage.milliseconds_elapsed)} ms")
        text = "\n".join(lines)
        print(text)
        return text
