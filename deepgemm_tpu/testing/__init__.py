from .numeric import calc_diff, count_bytes, assert_bitwise_equal
from .bench import bench, bench_profiled
from .utils import get_arch_major, get_device_core_count, test_filter
