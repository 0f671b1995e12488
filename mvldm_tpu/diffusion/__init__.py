from .schedulers import DDIMScheduler, DDPMScheduler, SchedulerCfg, get_scheduler

__all__ = ["DDIMScheduler", "DDPMScheduler", "SchedulerCfg", "get_scheduler"]
