from foodrec_tpu.engine.evaluator import by_user_metrics, evaluate_by_user  # noqa: F401
