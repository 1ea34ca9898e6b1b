from eovax.core.precision import Policy, DEFAULT_POLICY, FULL_PRECISION  # noqa: F401
