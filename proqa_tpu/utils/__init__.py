"""Shared utilities: logging, meters, profiling."""

from proqa_tpu.utils.logging import AverageMeter, MetricLogger, setup_logger

__all__ = ["AverageMeter", "MetricLogger", "setup_logger"]
