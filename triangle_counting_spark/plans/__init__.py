"""Plan-level machinery: checkpointed iteration substrate, auto planner."""
