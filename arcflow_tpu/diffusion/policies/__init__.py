"""Velocity-field policies (reference ``lakonlab/models/diffusions/policies``)."""

from .arcflow import ArcFlowPolicy

POLICY_CLASSES = {
    'ArcFlow': ArcFlowPolicy,
}

__all__ = ['ArcFlowPolicy', 'POLICY_CLASSES']
