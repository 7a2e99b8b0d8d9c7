"""Lightweight closed-loop driving simulator (microsim).

The reference evaluates closed-loop driving inside CARLA through the
leaderboard / scenario_runner / Bench2Drive harness (SURVEY.md L0) -- ~150k
LoC of vendored upstream simulator glue. This package is NOT a CARLA port:
it is a small, deterministic, pure-numpy world model implementing exactly
the surface the rest of the framework needs so that the complete loop

    collect (expert)  ->  label  ->  train  ->  closed-loop eval  ->  score

runs end-to-end in-repo, on any machine, with no simulator binary. The
real CARLA path stays available through the plugins in
simlingo_tpu/agent/carla_agent.py + carla_data_agent.py; the microsim's
runner emits the same leaderboard-format result JSON
(eval/driving_score.py parses both identically).

Modules:
  map.py       lane-polyline HD map + towns (straight / curved / crossing)
  actors.py    kinematic-bicycle vehicles (IDM + pure pursuit), walkers,
               static props, traffic lights
  world.py     the tick loop, spawning, collision queries
  camera.py    synthetic pinhole RGB + semantics + depth rendering
  scenarios.py Bench2Drive scenario inventory on microsim primitives
  criteria.py  leaderboard infraction criteria + penalty bookkeeping
  runner.py    route runner -> leaderboard-format records + CLI
"""

from simlingo_tpu.sim.map import Lane, Road, SimMap
from simlingo_tpu.sim.world import SimWorld
from simlingo_tpu.sim.runner import run_route

__all__ = ["Lane", "Road", "SimMap", "SimWorld", "run_route"]
