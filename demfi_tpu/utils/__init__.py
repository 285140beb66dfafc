from demfi_tpu.utils.meters import AverageMeter, ProgressPrinter

__all__ = ["AverageMeter", "ProgressPrinter"]
