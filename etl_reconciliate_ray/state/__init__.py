from .commitlog import CommitLog, PartEntry  # noqa: F401
