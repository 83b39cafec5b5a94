# Dataset loaders that call into the Python samplers (reference R/datasets.R).

#' Load the Hirano-Imbens continuous-treatment simulation.
#'
#' @param n Sample size.
#' @param v_dim Covariate dimension.
#' @param seed Random seed.
#' @param test_fraction Fraction held out as a test split.
#' @return list(train = list(x, y, v), test = list(x, y, v))
#' @export
load_sim_hirano_imbens <- function(n = 20000L, v_dim = 200L, seed = 0L,
                                   test_fraction = 0.2) {
  m <- .bayesgm_module()
  ds <- m$Sim_Hirano_Imbens_sampler(N = as.integer(n), v_dim = as.integer(v_dim),
                                    seed = as.integer(seed))
  all <- ds$load_all()
  x <- as.matrix(all[[1]]); y <- as.matrix(all[[2]]); v <- as.matrix(all[[3]])
  n_test <- as.integer(round(nrow(x) * test_fraction))
  idx_test <- seq_len(n_test)
  list(
    train = list(x = x[-idx_test, , drop = FALSE], y = y[-idx_test, , drop = FALSE],
                 v = v[-idx_test, , drop = FALSE]),
    test = list(x = x[idx_test, , drop = FALSE], y = y[idx_test, , drop = FALSE],
                v = v[idx_test, , drop = FALSE])
  )
}

#' Load the heteroskedastic latent-factor simulation for BGM.
#'
#' @param n Sample size.
#' @param k Latent dimension.
#' @param d Observed feature count.
#' @param seed Random seed.
#' @return Matrix (n, d + 1) with the response in column 1.
#' @export
load_sim_heteroskedastic <- function(n = 20000L, k = 3L, d = 19L, seed = 42L) {
  m <- .bayesgm_module()
  res <- m$simulate_z_hetero(n = as.integer(n), k = as.integer(k),
                             d = as.integer(d), seed = as.integer(seed))
  X <- as.matrix(res[[1]]); Y <- as.numeric(res[[2]])
  cbind(Y, X)
}
