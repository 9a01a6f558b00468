// stub: not needed by the shim (see lbfgs/lbfgs.hpp)
#pragma once
