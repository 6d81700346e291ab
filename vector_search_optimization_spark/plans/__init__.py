from .pipelines import FakeChatModel, analytics_prologue, cluster_label_pipeline  # noqa: F401
