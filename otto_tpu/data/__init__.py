from otto_tpu.data.events import EventStore, PackedSessions
from otto_tpu.data.labels import SessionLabels, build_labels, random_cutoffs
from otto_tpu.data.synthetic import synthetic_events
from otto_tpu.data import splits, submission
from otto_tpu.data.loader import BatchLoader

__all__ = [
    "EventStore",
    "PackedSessions",
    "SessionLabels",
    "build_labels",
    "random_cutoffs",
    "synthetic_events",
    "splits",
    "submission",
]
