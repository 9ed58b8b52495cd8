from .extra_runners import GanRunner, LanguageRunner, MixingRunner, PretrainRunner
from .runner import Runner, check_interval, device_batch
