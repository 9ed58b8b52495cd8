from .runner import Runner, check_interval, device_batch
