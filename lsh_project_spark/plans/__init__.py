"""Query plans: the driver-contract query registry and oracle SQL."""
