// Shim: included but not instantiated by the reference
// (src/TetEnergyTerm.hpp:25-27).
#ifndef MCL_OPTLIB_NLCG_SHIM_H
#define MCL_OPTLIB_NLCG_SHIM_H
#include "LBFGS.hpp"
#endif
