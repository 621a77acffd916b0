from .sharding import (scenario_mesh, shard_scenarios, solve_batch_sharded,
                       solve_joint_theta, BatchSolveStats)
