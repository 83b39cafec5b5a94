# R6 wrapper for the Python BGM engine (reference R/BGM.R).

.bgm_defaults <- list(
  z_dim = 10L,
  use_bnn = FALSE,
  dataset = "Rdata",
  output_dir = ".",
  save_res = FALSE,
  save_model = FALSE,
  g_units = c(64L, 64L, 64L, 64L, 64L),
  e_units = c(64L, 64L, 64L, 64L, 64L),
  dz_units = c(64L, 32L, 8L),
  dx_units = c(64L, 32L, 8L),
  lr = 1e-3, lr_theta = 5e-3, lr_z = 5e-3,
  gamma = 0.0, alpha = 0.0, g_d_freq = 1L, kl_weight = 5e-5
)

#' BGM model (R6)
#'
#' @description Bayesian generative model for tabular data with NaN-based
#'   missing-data imputation; wraps `bayesgm_tpu.BGM`.
#' @export
BGM <- R6::R6Class("BGM",
  public = list(
    #' @field params Merged parameter list.
    params = NULL,

    #' @description Create a BGM model.
    #' @param params Named list of overrides for the defaults.
    #' @param random_seed Integer seed (or NULL).
    initialize = function(params = list(), random_seed = NULL) {
      self$params <- utils::modifyList(.bgm_defaults, params)
      private$seed <- random_seed
    },

    #' @description Fit on a data matrix.
    #' @param data Numeric matrix (n, x_dim).
    #' @param epochs,batch_size,use_egm_init,egm_n_iter Training controls.
    fit = function(data, epochs = 100L, batch_size = 32L,
                   use_egm_init = TRUE, egm_n_iter = 20000L) {
      data <- as.matrix(data)
      p <- self$params
      p$x_dim <- ncol(data)
      model <- .bayesgm_module()$BGM(
        params = reticulate::dict(p),
        random_seed = if (is.null(private$seed)) NULL else as.integer(private$seed))
      model$fit(data = .np_f32(data), epochs = as.integer(epochs),
                batch_size = as.integer(batch_size),
                use_egm_init = use_egm_init, egm_n_iter = as.integer(egm_n_iter))
      private$model <- model
      invisible(self)
    },

    #' @description Impute NA entries with posterior means + intervals.
    #' @param data Matrix with NA for missing entries.
    #' @param alpha Significance level.
    #' @param n_mcmc,burn_in HMC controls.
    #' @return list(imputed = ..., interval = ...)
    predict = function(data, alpha = 0.05, n_mcmc = 5000L, burn_in = 5000L) {
      stopifnot(!is.null(private$model))
      data <- as.matrix(data)
      res <- private$model$predict(
        data = .np_f32(data), alpha = alpha,
        n_mcmc = as.integer(n_mcmc), burn_in = as.integer(burn_in))
      list(imputed = as.matrix(res[[1]]), interval = res[[2]])
    },

    #' @description Generate synthetic samples from the prior.
    #' @param nb_samples Number of samples.
    generate = function(nb_samples = 1000L) {
      stopifnot(!is.null(private$model))
      res <- private$model$generate(nb_samples = as.integer(nb_samples))
      as.matrix(res[[1]])
    }
  ),
  private = list(model = NULL, seed = NULL)
)
