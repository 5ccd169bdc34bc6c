from .explain import executed_plan, formatted_plan  # noqa: F401
